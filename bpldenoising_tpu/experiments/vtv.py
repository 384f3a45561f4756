"""Vectorial (color) TV experiment front-ends (beyond-reference family).

Mirrors the reference's experiment-driver shape (``src/BPLDenoising.jl:325-415``
— params merge, dataset load, bilevel learn, save_results, validate) for the
channel-coupled vectorial TV model (:mod:`..solvers.vtv`): datasets load as
planar (O, 3, M, N) color stacks (``testdataset(name, color=True)``; the
reference converts everything to grayscale, ``src/BPLDenoising.jl:331``),
the learned parameter is a scalar α or an (m, n) patch grid, and artifacts
land in the same ``output/<dataset>/`` layout as every other family with
RGB PNG triplets.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..learning.vtv import make_vtv_learning_function
from ..solvers.pdps import vtv_denoise
from ..utils.config import Params
from .api import (L2CostFunction, _canon, _np_dtype, _run_bilevel,
                  _validate, default_params, merge, testdataset)

__all__ = ["vtv_bilevel_params", "patch_vtv_bilevel_params",
           "scalar_bilevel_vtv_learn", "patch_bilevel_vtv_learn",
           "generate_vtv_cost", "generate_vtv_cost_plot",
           "validate_vtv_parameter", "VTVDenoise"]

# same TR schedule as the reference families (src/BPLDenoising.jl:316-323);
# color=True routes _load through the planar color loader
vtv_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.02,
    alpha0=0.05, color=True)

# patch analogue (cf. patch_bilevel_params, ref src/BPLDenoising.jl:350-357)
patch_vtv_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.5, delta0=0.02,
    alpha0=0.05 * np.ones((2, 2)), color=True)


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        import jax
        return "pallas" if jax.default_backend() != "cpu" else "jnp"
    return backend


def _check_method(params):
    m = params.get("method", "tr")
    if m not in (None, "tr", "tr_fused", "single_loop"):
        raise ValueError(f"VTV experiments support method='tr' (host trust "
                         f"region), 'tr_fused' (one-dispatch on-device "
                         f"loop) or 'single_loop' (first-order), got {m!r}")


def _run_vtv_single_loop(params, stretch_all=False):
    """Single-loop first-order VTV path behind the same experiment surface
    (``method='single_loop'``; artifacts match the TR paths')."""
    from ..bilevel.first_order_vtv import single_loop_vtv_learn
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
    res = single_loop_vtv_learn(
        ds[0], ds[1], np.asarray(params.alpha0),
        outer=int(params.sl_outer), n_inner=int(params.sl_inner),
        n_adj=int(params.sl_adj), lr=float(params.sl_lr),
        gamma=(1e-4 if params.get("vtv_gamma") is None
               else float(params.vtv_gamma)), mesh=mesh,
        log_every=single_loop_log_every(params.sl_outer))
    st, g_norm = single_loop_state(res, params.alpha0)
    out = BilevelResult(x=np.asarray(res.alpha), u=np.asarray(res.u),
                        state=st, cost=float(res.cost), g_norm=g_norm,
                        iterations=int(params.sl_outer))
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u), st)
    return out


def _run_vtv_fused(params, stretch_all=False):
    """Fused on-device VTV trust-region path (``method='tr_fused'``):
    identical TR semantics to the host loop but the whole outer loop is one
    device program (:func:`..bilevel.fused_vtv.bilevel_learn_vtv_fused`).
    ``log_every=j`` restores per-segment wall-clock logging, npz
    checkpoint/resume and per-iterate snapshots (same hooks as every other
    fused family)."""
    import jax

    from ..bilevel.fused_vtv import bilevel_learn_vtv_fused
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
    res = bilevel_learn_vtv_fused(
        ds, xinit=jnp.asarray(params.alpha0, ds[0].dtype), params=params,
        inner_maxiter=int(params.inner_maxiter),
        inner_tol=params.get("inner_tol"),
        gamma=(1e-4 if params.get("vtv_gamma") is None
               else float(params.vtv_gamma)),
        backend=backend, mesh=mesh,
        interpret=backend == "pallas" and jax.default_backend() == "cpu",
        log_every=None if log_every is None else int(log_every),
        segment_callback=seg_cb, init_B=init_B)
    out = _fused_to_result(res, it_offset=it_offset,
                           init_entries=init_entries)
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u),
                 out.state)
    return out


def VTVDenoise(data, parameter, maxiter: int = 10000,
               backend: str = "auto"):
    """Batched vectorial-TV denoising of planar (O, 3, M, N) / (3, M, N)
    color stacks at a fixed scalar α, (M, N) map, or (m, n) patch grid
    (the color companion of ``TVDenoise``, ref ``src/BPLDenoising.jl:41-82``)."""
    data = jnp.asarray(data)
    p = np.asarray(parameter, np.float64)
    if p.ndim == 2 and p.shape != tuple(data.shape[-2:]):
        from ..ops import PatchOp
        pop = PatchOp(tuple(p.shape), tuple(data.shape[-2:]))
        alpha = pop.apply(jnp.asarray(p, data.dtype))
    elif p.ndim in (0, 2):
        alpha = jnp.asarray(p, data.dtype)
    else:
        raise ValueError(f"VTV parameter must be a scalar, (M, N) map or "
                         f"(m, n) patch grid, got shape {p.shape}")
    if _resolve_backend(backend) == "pallas":
        from ..solvers.vtv_pallas import vtv_denoise_pdps_pallas
        return vtv_denoise_pdps_pallas(data, alpha, maxiter=maxiter)
    return vtv_denoise(data, alpha, maxiter=maxiter)


def scalar_bilevel_vtv_learn(visualise: bool = False, **kwargs):
    """Learn the scalar coupling weight α by the trust-region bilevel loop
    on color data (the vectorial analogue of ``scalar_bilevel_tv_learn``,
    ref ``src/BPLDenoising.jl:325-344``)."""
    params = merge(default_params, vtv_bilevel_params, kwargs)
    params = _canon(params)
    params = params | dict(save_prefix="vtv_optimal_parameter_scalar_"
                           + params.dataset_name)
    _check_method(params)
    if params.get("method") == "tr_fused":
        return _run_vtv_fused(params)
    if params.get("method") == "single_loop":
        return _run_vtv_single_loop(params)
    lf_kwargs = dict(
        maxiter=int(params.inner_maxiter),
        backend=_resolve_backend(params.get("backend", "auto")))
    if params.get("inner_tol") is not None:
        lf_kwargs["tol"] = float(params.inner_tol)
    if params.get("vtv_gamma") is not None:
        lf_kwargs["gamma"] = float(params.vtv_gamma)
    lf = make_vtv_learning_function(**lf_kwargs)
    return _run_bilevel(params, lf, visualise)


def patch_bilevel_vtv_learn(visualise: bool = False, **kwargs):
    """Learn a spatially-varying (m, n) coupling-weight patch grid on color
    data (the vectorial analogue of ``patch_bilevel_tv_learn``,
    ref ``src/BPLDenoising.jl:359-376``); the learned grid is saved as a
    stretched parameter-map PNG."""
    params = merge(default_params, patch_vtv_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.asarray(params.alpha0).shape)
    params = params | dict(
        save_prefix=f"vtv_optimal_parameter_patch_{shape}_"
        + params.dataset_name)
    _check_method(params)
    if params.get("method") == "tr_fused":
        return _run_vtv_fused(params)
    if params.get("method") == "single_loop":
        return _run_vtv_single_loop(params)
    lf_kwargs = dict(
        maxiter=int(params.inner_maxiter),
        backend=_resolve_backend(params.get("backend", "auto")))
    if params.get("inner_tol") is not None:
        lf_kwargs["tol"] = float(params.inner_tol)
    if params.get("vtv_gamma") is not None:
        lf_kwargs["gamma"] = float(params.vtv_gamma)
    lf = make_vtv_learning_function(**lf_kwargs)
    return _run_bilevel(params, lf, visualise)


def generate_vtv_cost(dataset_name, parameter_range, *, num_samples=1,
                      maxiter=5000, dtype="float64"):
    """1-D cost landscape over the scalar coupling weight α on color data
    (the vectorial analogue of ``generate_cost``,
    ref ``src/BPLDenoising.jl:92-111``); caches to
    ``<ds>_vtv_cost.npz`` plottable with :func:`generate_vtv_cost_plot`."""
    import jax

    from .api import _canon as canon, _load, _out_dir
    params = canon(merge(default_params, dataset_name=dataset_name,
                         num_samples=num_samples, dtype=dtype, color=True))
    true_, data = _load(params)
    rng = jnp.asarray(np.asarray(parameter_range, np.float64), true_.dtype)

    def one(a):
        u = vtv_denoise(data, a, maxiter=maxiter)
        return 0.5 * jnp.sum((u - true_) ** 2)

    costs = np.asarray(jax.jit(jax.vmap(one))(rng))
    out = _out_dir(params)
    np.savez(os.path.join(out, f"{params.dataset_name}_vtv_cost.npz"),
             parameter_range=np.asarray(parameter_range), costs=costs)
    return costs


def generate_vtv_cost_plot(dataset_name):
    """Line plot of the α sweep (cf. ref ``src/BPLDenoising.jl:113-125``)."""
    from ..data import full_datasetname
    from ..viz.plots import plot_cost_curve
    from .api import default_save_prefix
    dataset_name = full_datasetname(dataset_name)
    path = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_vtv_cost.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No cost calculation found at {path}")
    z = np.load(path)
    base = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_vtv_cost_plot")
    plot_cost_curve(z["parameter_range"], z["costs"], base)
    return base


def validate_vtv_parameter(parameter, **kwargs):
    """Re-denoise the color dataset at a fixed α + quality table (the
    vectorial analogue of ``validate_tv_parameter``,
    ref ``src/BPLDenoising.jl:381-415``)."""
    params = merge(default_params, vtv_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.shape(parameter))
    params = params | dict(
        save_prefix=f"val_vtv_optimal_parameter_{shape}_"
        + params.dataset_name)
    img, noisy = testdataset(params.dataset_name, color=True)
    dt = _np_dtype(params)
    u = np.asarray(VTVDenoise(jnp.asarray(noisy, dt), parameter))
    cost = L2CostFunction(u, img)
    print(f"Denoising parameter {parameter}: cost = {cost}",
          file=sys.stderr)
    mean_ssim, mean_psnr = _validate(params, u, img, noisy)
    return dict(cost=cost, mean_ssim=mean_ssim, mean_psnr=mean_psnr, u=u)
