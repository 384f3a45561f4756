"""TV-L1 experiment front-ends (beyond-reference noise-model axis).

The reference's experiment drivers all pair Gaussian noise with the
quadratic data term (``src/BPLDenoising.jl:41-59``); this module exposes
the robust L1-data-term model (:mod:`..solvers.tvl1`) behind the same
surface shapes — batched denoise, fixed-parameter validation with the
standard quality table/PNG artifacts, and the 1-D cost-landscape sweep
that is the reference's own de-facto parameter-selection oracle
(``src/BPLDenoising.jl:92-130``).

Bilevel learning (DESIGN.md "TV-L1" scope note, now landed): the plain
TV-L1 solution path is piecewise constant in α, so gradient-based
learning goes through the Huber-smoothed surrogate
(:mod:`..solvers.tvl1_huber`) — :func:`scalar_bilevel_tvl1_learn` /
:func:`patch_bilevel_tvl1_learn` run the trust-region loop on the
smoothed implicit hypergradient (validated against finite differences in
``tests/test_tvl1_learn.py``); the sweep + validate pair remains the
selection oracle for the UNsmoothed model.
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
           "generate_tvl1_cost_plot", "tvl1_params",
           "scalar_bilevel_tvl1_learn", "patch_bilevel_tvl1_learn",
           "tvl1_bilevel_params", "patch_tvl1_bilevel_params"]

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


# ---------------------------------------------------------------------------
# Bilevel learning of the TV-L1 weight (Huber-smoothed surrogate)
# ---------------------------------------------------------------------------

# TR constants follow the reference preset shape (``src/BPLDenoising.jl:316-323``)
# rescaled to the O(1) TV-L1 weight range; the bundled impulse-noise dataset
# is the natural default.
tvl1_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1, alpha0=0.4,
    dataset_name="circle_sp_128_20",
    tvl1_gamma_d=100.0,   # data Huber slope (width 1/γ_d in intensity units)
    tvl1_gamma=1000.0)    # regularizer Huber slope (cf. ref γ = 1e8,
#                           src/TVLearningFunctionVec.jl:34 — moderate here
#                           so the smoothed gradient stays informative
#                           across TV-L1's plateaus)

patch_tvl1_bilevel_params = tvl1_bilevel_params | Params(
    delta0=0.1, alpha0=0.4 * np.ones((2, 2)))


def _check_method(params):
    m = params.get("method", "tr")
    if m not in (None, "tr", "tr_fused", "single_loop"):
        raise ValueError(f"TV-L1 experiments support method='tr' (host "
                         f"trust region), 'tr_fused' (one-dispatch "
                         f"on-device loop) or 'single_loop' (first-order), "
                         f"got {m!r}")


def _cg_kwargs(params):
    """Optional adjoint-CG accuracy overrides, forwarded to every method
    variant so data_parallel/fused runs can't silently diverge from the
    single-device defaults (ADVICE r3)."""
    kw = {}
    if params.get("cg_tol") is not None:
        kw["cg_tol"] = float(params.cg_tol)
    if params.get("cg_maxiter") is not None:
        kw["cg_maxiter"] = int(params.cg_maxiter)
    return kw


def _run_tvl1_single_loop(params, stretch_all=True):
    """Single-loop first-order TV-L1 path behind the same experiment
    surface (``method='single_loop'``; artifacts match the TR paths')."""
    from ..bilevel.first_order_tvl1 import single_loop_tvl1_learn
    from ..bilevel.trust_region import BilevelResult
    from .api import (_load, _reject_flags, _stretched_inputs,
                      linear_stretch, save_results, single_loop_log_every,
                      single_loop_state)

    _reject_flags(params, "single_loop",
                  ("checkpoint", "resume", "save_iterations", "inner_tol"))
    mesh = None
    if params.get("data_parallel"):
        from ..parallel import make_batch_mesh
        mesh = make_batch_mesh()
    ds = _load(params)
    res = single_loop_tvl1_learn(
        ds[0], ds[1], np.asarray(params.alpha0),
        outer=int(params.sl_outer), n_inner=int(params.sl_inner),
        n_adj=int(params.sl_adj), lr=float(params.sl_lr),
        gamma_d=float(params.tvl1_gamma_d),
        gamma=float(params.tvl1_gamma), mesh=mesh,
        log_every=single_loop_log_every(params.sl_outer))
    st, g_norm = single_loop_state(res, params.alpha0)
    out = BilevelResult(x=np.asarray(res.alpha), u=np.asarray(res.u),
                        state=st, cost=float(res.cost), g_norm=g_norm,
                        iterations=int(params.sl_outer))
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u), st)
    return out


def _run_tvl1_fused(params, stretch_all=True):
    """Fused on-device TV-L1 trust-region path (``method='tr_fused'``):
    identical TR semantics to the host loop but the whole outer loop is one
    device program (:func:`..bilevel.fused_tvl1.bilevel_learn_tvl1_fused`).
    ``log_every=j`` restores per-segment wall-clock logging, npz
    checkpoint/resume and per-iterate snapshots (same hooks as every other
    fused family)."""
    import jax

    from ..bilevel.fused_tvl1 import bilevel_learn_tvl1_fused
    from .api import (_fused_observability, _fused_to_result, _load,
                      _stretched_inputs, linear_stretch, save_results)

    backend = _resolve_backend(params.get("backend", "auto"))
    mesh = None
    if params.get("data_parallel"):
        from ..parallel import make_batch_mesh
        mesh = make_batch_mesh()
    ds = _load(params)
    (params, log_every, seg_cb, init_B, it_offset,
     init_entries) = _fused_observability(params)
    res = bilevel_learn_tvl1_fused(
        ds, xinit=jnp.asarray(params.alpha0, ds[0].dtype), params=params,
        inner_maxiter=int(params.inner_maxiter),
        inner_tol=params.get("inner_tol"),
        gamma_d=float(params.tvl1_gamma_d),
        gamma=float(params.tvl1_gamma), backend=backend, mesh=mesh,
        interpret=backend == "pallas" and jax.default_backend() == "cpu",
        log_every=None if log_every is None else int(log_every),
        segment_callback=seg_cb, init_B=init_B, **_cg_kwargs(params))
    out = _fused_to_result(res, it_offset=it_offset,
                           init_entries=init_entries)
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u),
                 out.state)
    return out


def _tvl1_lf(params):
    from ..learning.tvl1 import make_tvl1_learning_function
    if params.get("data_parallel"):
        if params.get("inner_tol") is not None:
            raise ValueError(
                "inner_tol is not supported with data_parallel=True "
                "(the sharded learning function runs the fixed budget)")
        from ..parallel import (make_batch_mesh,
                                make_sharded_tvl1_learning_function)
        return make_sharded_tvl1_learning_function(
            make_batch_mesh(), maxiter=int(params.inner_maxiter),
            gamma_d=float(params.tvl1_gamma_d),
            gamma=float(params.tvl1_gamma), **_cg_kwargs(params))
    lf_kwargs = dict(
        maxiter=int(params.inner_maxiter),
        gamma_d=float(params.tvl1_gamma_d),
        gamma=float(params.tvl1_gamma), **_cg_kwargs(params))
    if params.get("inner_tol") is not None:
        lf_kwargs["tol"] = float(params.inner_tol)
    return make_tvl1_learning_function(**lf_kwargs)


def scalar_bilevel_tvl1_learn(visualise: bool = False, **kwargs):
    """Learn the scalar TV-L1 weight by the trust-region bilevel loop on
    the Huber-smoothed surrogate (the impulse-noise analogue of
    ``scalar_bilevel_tv_learn``, ref ``src/BPLDenoising.jl:325-344``).
    ``method='tr'|'tr_fused'|'single_loop'`` selects the full method
    matrix, same as every other family."""
    from .api import _run_bilevel
    params = merge(default_params, tvl1_bilevel_params, kwargs)
    params = _canon(params)
    params = params | dict(save_prefix="tvl1_optimal_parameter_scalar_"
                           + params.dataset_name)
    _check_method(params)
    if params.get("method") == "tr_fused":
        return _run_tvl1_fused(params)
    if params.get("method") == "single_loop":
        return _run_tvl1_single_loop(params)
    lf = _tvl1_lf(params)
    return _run_bilevel(params, lf, visualise, stretch_all=True)


def patch_bilevel_tvl1_learn(visualise: bool = False, **kwargs):
    """Learn a spatially-varying (m, n) TV-L1 weight grid (the
    impulse-noise analogue of ``patch_bilevel_tv_learn``, ref
    ``src/BPLDenoising.jl:359-376``); the learned grid is saved as a
    stretched parameter-map PNG.  Full ``method=`` matrix as in
    :func:`scalar_bilevel_tvl1_learn`."""
    from .api import _run_bilevel
    params = merge(default_params, patch_tvl1_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.asarray(params.alpha0).shape)
    params = params | dict(
        save_prefix=f"tvl1_optimal_parameter_{shape}_" + params.dataset_name)
    _check_method(params)
    if params.get("method") == "tr_fused":
        return _run_tvl1_fused(params)
    if params.get("method") == "single_loop":
        return _run_tvl1_single_loop(params)
    lf = _tvl1_lf(params)
    return _run_bilevel(params, lf, visualise, stretch_all=True)
