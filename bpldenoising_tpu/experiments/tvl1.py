"""TV-L1 experiment front-ends (beyond-reference noise-model axis).

The reference's experiment drivers all pair Gaussian noise with the
quadratic data term (``src/BPLDenoising.jl:41-59``); this module exposes
the robust L1-data-term model (:mod:`..solvers.tvl1`) behind the same
surface shapes — batched denoise, fixed-parameter validation with the
standard quality table/PNG artifacts, and the 1-D cost-landscape sweep
that is the reference's own de-facto parameter-selection oracle
(``src/BPLDenoising.jl:92-130``).

Scope note (DESIGN.md "TV-L1"): gradient-based bilevel learning for the
L1 data term needs a Huber-smoothed data-term implicit derivative (the
TV-L1 solution path is piecewise constant in α on piecewise-constant
images, so finite differences sit on plateaus); the sweep + validate
pair is the honest parameter-selection story until that lands.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..solvers.tvl1 import tvl1_denoise
from ..utils.config import Params
from .api import (L2CostFunction, _canon, _np_dtype, _validate,
                  default_params, merge, testdataset)

__all__ = ["TVL1Denoise", "validate_tvl1_parameter", "generate_tvl1_cost",
           "generate_tvl1_cost_plot", "tvl1_params"]

# TV-L1 weights live on an O(1) scale (the data term is ‖·‖₁, not ½‖·‖²);
# validation uses the reference's 10000-iteration budget
# (``src/BPLDenoising.jl:51``)
tvl1_params = Params(alpha0=1.0, inner_maxiter=10000)


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        import jax
        return "pallas" if jax.default_backend() != "cpu" else "jnp"
    return backend


def TVL1Denoise(data, parameter, maxiter: int = 10000,
                backend: str = "auto"):
    """Batched TV-L1 denoising of (O, M, N) / (M, N) stacks at a fixed
    scalar α, (M, N) map, or (m, n) patch grid (the impulse-noise
    companion of ``TVDenoise``, ref ``src/BPLDenoising.jl:41-82``).
    ``backend="auto"`` runs the fused VMEM-resident kernel
    (:mod:`..solvers.tvl1_pallas`) on accelerators."""
    data = jnp.asarray(data)
    p = np.asarray(parameter, np.float64)
    if p.ndim == 2 and p.shape != tuple(data.shape[-2:]):
        from ..ops import PatchOp
        pop = PatchOp(tuple(p.shape), tuple(data.shape[-2:]))
        alpha = pop.apply(jnp.asarray(p, data.dtype))
    elif p.ndim in (0, 2):
        alpha = jnp.asarray(p, data.dtype)
    else:
        raise ValueError(f"TV-L1 parameter must be a scalar, (M, N) map "
                         f"or (m, n) patch grid, got shape {p.shape}")
    if _resolve_backend(backend) == "pallas":
        from ..solvers.tvl1_pallas import tvl1_denoise_pallas
        return tvl1_denoise_pallas(data, alpha, maxiter=maxiter)
    return tvl1_denoise(data, alpha, maxiter=maxiter)


def validate_tvl1_parameter(parameter, **kwargs):
    """Re-denoise the dataset at a fixed α + quality table (the TV-L1
    analogue of ``validate_tv_parameter``, ref
    ``src/BPLDenoising.jl:381-415``)."""
    params = merge(default_params, tvl1_params, kwargs)
    params = _canon(params)
    shape = tuple(np.shape(parameter))
    params = params | dict(
        save_prefix=f"val_tvl1_optimal_parameter_{shape}_"
        + params.dataset_name)
    img, noisy = testdataset(params.dataset_name)
    dt = _np_dtype(params)
    u = np.asarray(TVL1Denoise(jnp.asarray(noisy, dt), parameter,
                               maxiter=int(params.inner_maxiter)))
    cost = L2CostFunction(u, img)
    print(f"Denoising parameter {parameter}: cost = {cost}",
          file=sys.stderr)
    mean_ssim, mean_psnr = _validate(params, u, img, noisy)
    return dict(cost=cost, mean_ssim=mean_ssim, mean_psnr=mean_psnr, u=u)


def generate_tvl1_cost(dataset_name, parameter_range, *, num_samples=1,
                       maxiter=5000, dtype="float64"):
    """1-D L2-cost landscape over the TV-L1 weight α (the analogue of
    ``generate_cost``, ref ``src/BPLDenoising.jl:92-111``); caches to
    ``<ds>_tvl1_cost.npz`` for :func:`generate_tvl1_cost_plot`."""
    import jax

    from .api import _canon as canon, _load, _out_dir
    params = canon(merge(default_params, dataset_name=dataset_name,
                         num_samples=num_samples, dtype=dtype))
    true_, data = _load(params)
    rng = jnp.asarray(np.asarray(parameter_range, np.float64), true_.dtype)

    def one(a):
        u = tvl1_denoise(data, a, maxiter=maxiter)
        return 0.5 * jnp.sum((u - true_) ** 2)

    costs = np.asarray(jax.jit(jax.vmap(one))(rng))
    out = _out_dir(params)
    np.savez(os.path.join(out, f"{params.dataset_name}_tvl1_cost.npz"),
             parameter_range=np.asarray(parameter_range), costs=costs)
    return costs


def generate_tvl1_cost_plot(dataset_name):
    """Line plot of the α sweep (cf. ref ``src/BPLDenoising.jl:113-125``)."""
    from ..data import full_datasetname
    from ..viz.plots import plot_cost_curve
    from .api import default_save_prefix
    dataset_name = full_datasetname(dataset_name)
    path = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_tvl1_cost.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"run generate_tvl1_cost('{dataset_name}', ...) first ({path})")
    d = np.load(path)
    base = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_tvl1_cost_plot")
    plot_cost_curve(d["parameter_range"], d["costs"], base,
                    title="TV-L1 Scalar Cost")
    return base
