"""TGV² experiment front-ends (beyond-reference model family).

Mirrors the reference's experiment-driver shape (``src/BPLDenoising.jl:325-449``
— params merge, dataset load, bilevel learn, save_results, validate) for
second-order total generalized variation (:mod:`..solvers.tgv`): the
parameter is the 2-vector (α₁, α₀) weighting the first- and second-order
terms.  Artifacts land in the same ``output/<dataset>/`` layout as every
other family.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..learning.tgv import make_tgv_learning_function
from ..solvers.tgv import tgv_denoise_pdps
from .api import (L2CostFunction, _canon, _np_dtype, _run_bilevel,
                  _validate, default_params, merge, testdataset)
from ..utils.config import Params

__all__ = ["tgv_bilevel_params", "patch_tgv_bilevel_params",
           "scalar_bilevel_tgv_learn", "patch_bilevel_tgv_learn",
           "generate_tgv_cost", "generate_tgv_cost_plot",
           "validate_tgv_parameter", "TGVDenoise"]

# same TR schedule as the reference families (src/BPLDenoising.jl:316-323);
# Δ₀/α₀ sized for the 2-vector weight.  sl_lr: the TGV cost is nearly
# flat in α₀ far from the optimum, and Adam at the TV families' lr=0.05
# outruns the fixed single-loop inner budget there (measured runaway to
# α₀ ≈ 800 on pyramid_128_10, cost 3.3× the minimum; at 0.02 it lands
# slightly DEEPER than the trust region — FIDELITY.md "TGV method
# agreement").
tgv_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.02,
    alpha0=np.array([0.05, 0.05]), sl_lr=0.02)

# patch analogue (cf. patch_sumregs_bilevel_params, ref :455-462): an
# (m, n, 2) stack of (α₁, α₀) grids upsampled piecewise-constant
patch_tgv_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.5, delta0=0.02,
    alpha0=0.05 * np.ones((2, 2, 2)), sl_lr=0.02)


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        import jax
        return "pallas" if jax.default_backend() != "cpu" else "jnp"
    return backend


def TGVDenoise(data, parameter, maxiter: int = 10000,
               backend: str = "auto"):
    """Batched TGV² denoising at a fixed (α₁, α₀) pair or an (m, n, 2)
    patch-grid stack of spatially-varying weights (companion of
    ``TVDenoise``'s scalar/patch forms, ref ``src/BPLDenoising.jl:41-82``)."""
    data = jnp.asarray(data)
    p = np.asarray(parameter, np.float64)
    if p.ndim == 3 and p.shape[-1] == 2:   # patch grids → (M, N) maps
        from ..ops import PatchOp
        pop = PatchOp.for_image(p[..., 0],
                                data[0] if data.ndim == 3 else data)
        a1 = pop.apply(jnp.asarray(p[..., 0], data.dtype))
        a0 = pop.apply(jnp.asarray(p[..., 1], data.dtype))
    elif p.reshape(-1).size == 2:
        a1, a0 = float(p.reshape(-1)[0]), float(p.reshape(-1)[1])
    else:
        raise ValueError(f"TGV parameter must be (alpha1, alpha0) or an "
                         f"(m, n, 2) patch stack, got {np.shape(parameter)}")
    if _resolve_backend(backend) == "pallas":
        from ..solvers.tgv_pallas import tgv_denoise_pdps_pallas
        u, _ = tgv_denoise_pdps_pallas(data, a1, a0, maxiter=maxiter)
    else:
        u, _ = tgv_denoise_pdps(data, a1, a0, maxiter=maxiter)
    return u


def _run_tgv_single_loop(params, stretch_all=True):
    """Single-loop first-order TGV path behind the same experiment surface
    (``method='single_loop'``; artifacts match the TR paths')."""
    from ..bilevel.first_order_tgv import single_loop_tgv_learn
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
    res = single_loop_tgv_learn(
        ds[0], ds[1], np.asarray(params.alpha0),
        outer=int(params.sl_outer), n_inner=int(params.sl_inner),
        n_adj=int(params.sl_adj), lr=float(params.sl_lr),
        gamma=(1e-4 if params.get("tgv_gamma") is None
               else float(params.tgv_gamma)), mesh=mesh,
        log_every=single_loop_log_every(params.sl_outer))
    st, g_norm = single_loop_state(res, params.alpha0)
    out = BilevelResult(x=np.asarray(res.alpha), u=np.asarray(res.u),
                        state=st, cost=float(res.cost), g_norm=g_norm,
                        iterations=int(params.sl_outer))
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u), st)
    return out


def _run_tgv_fused(params, stretch_all=True):
    """Fused on-device TGV trust-region path (``method='tr_fused'``):
    identical TR semantics to the host loop but the whole outer loop is one
    device program (:func:`..bilevel.fused_tgv.bilevel_learn_tgv_fused`).
    ``log_every=j`` runs the loop in j-iteration segments, restoring
    per-segment wall-clock logging, npz checkpoint/resume and per-iterate
    PNG snapshots (the same hooks as the TV/sumregs fused path)."""
    import jax

    from ..bilevel.fused_tgv import bilevel_learn_tgv_fused
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
    res = bilevel_learn_tgv_fused(
        ds, xinit=jnp.asarray(params.alpha0, ds[0].dtype), params=params,
        inner_maxiter=int(params.inner_maxiter),
        inner_tol=params.get("inner_tol"),
        gamma=(1e-4 if params.get("tgv_gamma") is None
               else float(params.tgv_gamma)),
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


def scalar_bilevel_tgv_learn(visualise: bool = False, **kwargs):
    """Learn (α₁, α₀) by the trust-region bilevel loop (the TGV analogue of
    ``scalar_bilevel_sumregs_learn``, ref ``src/BPLDenoising.jl:432-449``)."""
    params = merge(default_params, tgv_bilevel_params, kwargs)
    params = _canon(params)
    params = params | dict(save_prefix="tgv_optimal_parameter_"
                           + params.dataset_name)
    if params.get("method") == "single_loop":
        return _run_tgv_single_loop(params, stretch_all=True)
    if params.get("method") == "tr_fused":
        return _run_tgv_fused(params, stretch_all=True)
    lf_kwargs = dict(
        maxiter=int(params.inner_maxiter),
        backend=_resolve_backend(params.get("backend", "auto")))
    if params.get("inner_tol") is not None:
        lf_kwargs["tol"] = float(params.inner_tol)
    if params.get("tgv_gamma") is not None:
        lf_kwargs["gamma"] = float(params.tgv_gamma)
    lf = make_tgv_learning_function(**lf_kwargs)
    return _run_bilevel(params, lf, visualise, stretch_all=True)


def patch_bilevel_tgv_learn(visualise: bool = False, **kwargs):
    """Learn spatially-varying (α₁, α₀) patch grids — the TGV analogue of
    ``patch_bilevel_tv_learn`` (ref ``src/BPLDenoising.jl:359-376``); the
    learned (m, n, 2) stack is saved as two stretched parameter-map PNGs."""
    params = merge(default_params, patch_tgv_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.asarray(params.alpha0).shape)
    params = params | dict(
        save_prefix=f"tgv_optimal_parameter_patch_{shape}_"
        + params.dataset_name)
    if params.get("method") == "single_loop":
        return _run_tgv_single_loop(params, stretch_all=True)
    if params.get("method") == "tr_fused":
        return _run_tgv_fused(params, stretch_all=True)
    lf_kwargs = dict(
        maxiter=int(params.inner_maxiter),
        backend=_resolve_backend(params.get("backend", "auto")))
    if params.get("inner_tol") is not None:
        lf_kwargs["tol"] = float(params.inner_tol)
    if params.get("tgv_gamma") is not None:
        lf_kwargs["gamma"] = float(params.tgv_gamma)
    lf = make_tgv_learning_function(**lf_kwargs)
    return _run_bilevel(params, lf, visualise, stretch_all=True)


def generate_tgv_cost(dataset_name, parameter_range_1, parameter_range_2,
                      *, num_samples=1, maxiter=5000, dtype="float64"):
    """2-D cost landscape over the TGV weight pair (α₁, α₀) — the TGV
    analogue of ``generate_2d_tv_cost`` (ref ``src/BPLDenoising.jl:136-160``;
    the reference uses such sweeps as its learning-validation oracle).  One
    vmapped batched solve over the flattened grid; caches to
    ``<ds>_tgv_cost_2d.npz`` in the standard layout, plottable with
    :func:`generate_tgv_cost_plot`."""
    import jax

    from .api import _canon as canon, _load, _out_dir
    params = canon(merge(default_params, dataset_name=dataset_name,
                         num_samples=num_samples, dtype=dtype))
    true_, data = _load(params)
    r1 = np.asarray(parameter_range_1, dtype=np.float64)
    r2 = np.asarray(parameter_range_2, dtype=np.float64)
    A1, A0 = np.meshgrid(r1, r2, indexing="ij")
    pairs = jnp.asarray(np.stack([A1.ravel(), A0.ravel()], axis=1),
                        true_.dtype)

    def one(pair):
        u, _ = tgv_denoise_pdps(data, pair[0], pair[1], maxiter=maxiter)
        return 0.5 * jnp.sum((u - true_) ** 2)

    costs = np.asarray(jax.jit(jax.vmap(one))(pairs)).reshape(A1.shape)
    out = _out_dir(params)
    np.savez(os.path.join(out, f"{params.dataset_name}_tgv_cost_2d.npz"),
             parameter_range_1=r1, parameter_range_2=r2, costs=costs)
    return costs


def generate_tgv_cost_plot(dataset_name):
    """Contour plot of the (α₁, α₀) sweep (cf. ref
    ``src/BPLDenoising.jl:160-178``)."""
    from ..data import full_datasetname
    from ..viz.plots import plot_cost_contour
    from .api import default_save_prefix
    dataset_name = full_datasetname(dataset_name)
    path = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_tgv_cost_2d.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No cost calculation found at {path}")
    z = np.load(path)
    base = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_tgv_cost_plot_2d")
    plot_cost_contour(z["parameter_range_1"], z["parameter_range_2"],
                      z["costs"], base)
    return base


def validate_tgv_parameter(parameter, **kwargs):
    """Re-denoise the dataset at a fixed (α₁, α₀) + quality table (the TGV
    analogue of ``validate_tv_parameter``, ref ``src/BPLDenoising.jl:381-415``)."""
    params = merge(default_params, tgv_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.shape(parameter))
    params = params | dict(
        save_prefix=f"val_tgv_optimal_parameter_{shape}_"
        + params.dataset_name)
    img, noisy = testdataset(params.dataset_name)
    dt = _np_dtype(params)
    u = np.asarray(TGVDenoise(jnp.asarray(noisy, dt), parameter))
    cost = L2CostFunction(u, img)
    print(f"Denoising parameter {parameter}: cost = {cost}",
          file=sys.stderr)
    mean_ssim, mean_psnr = _validate(params, u, img, noisy)
    return dict(cost=cost, mean_ssim=mean_ssim, mean_psnr=mean_psnr, u=u)
