"""User-facing experiment API.

Equivalents of every exported function of the reference module
(``src/BPLDenoising.jl:3-6``):

* ``scalar_bilevel_tv_learn`` / ``patch_bilevel_tv_learn``
* ``scalar_bilevel_sumregs_learn`` / ``patch_bilevel_sumregs_learn``
* ``validate_tv_parameter`` / ``validate_sumregs_parameter``
* ``generate_scalar_tv_cost`` / ``generate_cost_plot``
* ``generate_2d_tv_cost`` / ``generate_2d_cost_plot``

plus ``TVDenoise`` and ``save_results``.  Output layout mirrors the
reference: ``output/<dataset>/<prefix>{.txt,_quality.txt,_true_i.png,…}``
(``src/BPLDenoising.jl:185-299``).

TPU-first notes: cost sweeps vmap the whole α-range into one batched PDPS
solve instead of the reference's serial loop (``src/BPLDenoising.jl:99``);
learning runs add optional npz checkpointing (absent in the reference).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..bilevel import bilevel_learn
from ..data import (full_datasetname, testdataset, write_png_color,
                    write_png_gray)
from ..learning import (
    make_sumregs_learning_function,
    make_tv_learning_function,
)
from ..metrics import l2_cost, psnr, psnr_np, ssim, ssim_np
from ..models import tv_model
from ..ops import PatchOp
from ..solvers import denoise_pdps
from ..utils.checkpoint import CheckpointWriter
from ..utils.config import Params, merge
from ..viz import plot_cost_contour, plot_cost_curve, write_log

__all__ = [
    "TVDenoise",
    "L2CostFunction",
    "generate_scalar_tv_cost", "generate_cost_plot",
    "generate_2d_tv_cost", "generate_2d_cost_plot",
    "scalar_bilevel_tv_learn", "patch_bilevel_tv_learn",
    "scalar_bilevel_sumregs_learn", "patch_bilevel_sumregs_learn",
    "validate_tv_parameter", "validate_sumregs_parameter",
    "save_results",
    "default_params", "bilevel_params", "patch_bilevel_params",
    "sumregs_bilevel_params", "patch_sumregs_bilevel_params",
]

default_save_prefix = "output"  # ref src/BPLDenoising.jl:38

# ref src/BPLDenoising.jl:306-314
default_params = Params(
    verbose_iter=1,
    maxiter=20,
    save_results=True,
    dataset_name="cameraman_128_5",
    save_iterations=False,
    tol=1e-5,
    num_samples=1,
    checkpoint=False,
    dtype="float64",   # reference is Float64 end-to-end; TPU runs use float32
    inner_maxiter=5000,
    inner_tol=None,    # optional PDPS early stop (reference: fixed budget);
    #                    set e.g. 1e-6 to stop on relative change per 500 its
    backend="auto",    # "pallas" | "jnp" | "auto" (pallas on accelerators)
    data_parallel=False,   # shard the image batch over all local devices
    method="tr",       # "tr" (reference trust region, host-driven loop)
    #                    | "tr_fused" (same TR semantics, whole loop on
    #                      device — fastest on remote accelerators)
    #                    | "single_loop" (first-order, beyond-reference)
    sl_outer=300, sl_inner=40, sl_adj=10, sl_lr=0.05,   # single-loop knobs
)


def _make_lf(params, factory):
    """Build a learning function honoring inner_maxiter/inner_tol/backend/
    data_parallel.  ``inner_tol`` enables early-stopped inner solves AND
    PDPS-state warm starting across trust-region evaluations (both the
    fused kernel and the jnp path support it); ``data_parallel=True``
    shards the image batch over all local devices (shard_map + psum)."""
    tol = params.get("inner_tol")
    backend = params.get("backend", "auto")
    if backend == "auto":
        import jax
        backend = "pallas" if jax.default_backend() != "cpu" else "jnp"
    if params.get("data_parallel"):
        if tol is not None:
            raise ValueError(
                "inner_tol is not supported with data_parallel=True "
                "(the sharded learning functions run the fixed budget)")
        from ..learning import (make_sumregs_learning_function,
                                make_tv_learning_function)
        from ..parallel import (make_batch_mesh,
                                make_sharded_sumregs_learning_function,
                                make_sharded_tv_learning_function)
        sharded = (make_sharded_tv_learning_function
                   if factory is make_tv_learning_function
                   else make_sharded_sumregs_learning_function)
        return sharded(make_batch_mesh(),
                       maxiter=int(params.inner_maxiter), backend=backend)
    kwargs = dict(maxiter=int(params.inner_maxiter), backend=backend)
    if tol is not None:
        kwargs["solver_kwargs"] = dict(tol=float(tol))
    return factory(**kwargs)

# ref src/BPLDenoising.jl:316-323 (η₁/η₂/β₁/β₂/Δ₀/α₀ → ASCII names)
bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1, alpha0=0.1)

# ref src/BPLDenoising.jl:350-357
patch_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=1e-4,
    alpha0=1e-4 * np.ones((2, 2)))

# ref src/BPLDenoising.jl:423-430
sumregs_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.01,
    alpha0=np.array([1e-3, 1e-3, 1e-3]))

# ref src/BPLDenoising.jl:455-462
patch_sumregs_bilevel_params = Params(
    eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.5, delta0=0.1,
    alpha0=1e-3 * np.ones((2, 2, 3)))

_TV = tv_model()


def _np_dtype(params) -> np.dtype:
    return np.dtype(params.get("dtype", "float64"))


def _canon(params):
    """Resolve a partial dataset name once so save paths, prefixes and the
    loader all agree (the reference resolves only inside testdataset and
    writes outputs under the unresolved name — a CWD-dependent quirk)."""
    return params | dict(dataset_name=full_datasetname(params.dataset_name))


def _load(params):
    """Dataset → (O, M, N) float stacks sliced to num_samples
    (ref src/BPLDenoising.jl:330-332); ``color=True`` in params loads
    planar (O, 3, M, N) stacks for the vectorial-TV family."""
    true_, data = testdataset(params.dataset_name,
                              color=bool(params.get("color")))
    n = int(params.num_samples)
    dt = _np_dtype(params)
    return (jnp.asarray(true_[:n], dt), jnp.asarray(data[:n], dt))


def _out_dir(params) -> str:
    path = os.path.join(default_save_prefix, params.dataset_name)
    os.makedirs(path, exist_ok=True)
    return path


def linear_stretch(x: np.ndarray) -> np.ndarray:
    """Min-max stretch to [0, 1] (ref ImageContrastAdjustment
    ``LinearStretching``, src/BPLDenoising.jl:337-339)."""
    x = np.asarray(x, dtype=np.float64)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


# ---------------------------------------------------------------------------
# Standalone denoising + cost sweeps
# ---------------------------------------------------------------------------

def TVDenoise(data, parameter, visualize: bool = False, maxiter: int = 10000):
    """TV denoising of an (O, M, N) stack with scalar or patch parameter
    (ref ``TVDenoise``, src/BPLDenoising.jl:41-82; maxiter = 10000).
    ``visualize`` shows the result in the live view (headless-safe no-op)."""
    data = jnp.asarray(data)
    p = np.asarray(parameter)
    if p.ndim == 2:  # patch parameter → upsample (ref :62-64)
        pop = PatchOp.for_image(p, data[0] if data.ndim == 3 else data)
        alpha = pop.apply(jnp.asarray(p, data.dtype))
    else:
        alpha = jnp.asarray(parameter, data.dtype)
    u = denoise_pdps(data, (alpha,), _TV, maxiter=maxiter)
    if visualize:
        # leave the window open (non-blocking) for interactive sessions;
        # headless backends make this a no-op
        from ..bilevel.harness import LiveView
        LiveView().show(np.asarray(u[0] if u.ndim == 3 else u), None)
    return u


def L2CostFunction(u, true_):
    """ref src/BPLDenoising.jl:84-86."""
    return float(l2_cost(u, true_))


def generate_cost(dataset_name, parameter_range, *, num_samples=1,
                  maxiter=10000, dtype="float64", freq=10):
    """Cost landscape over scalar α (ref ``generate_cost``,
    src/BPLDenoising.jl:92-111) — one vmapped batched solve over the whole
    α range instead of a serial loop.  Caches to ``<ds>_cost.npz``."""
    params = _canon(merge(default_params, dataset_name=dataset_name,
                          num_samples=num_samples, dtype=dtype))
    true_, data = _load(params)
    alphas = jnp.asarray(np.asarray(parameter_range), true_.dtype)

    sweep = jax.jit(jax.vmap(
        lambda a: 0.5 * jnp.sum(
            (denoise_pdps(data, (a,), _TV, maxiter=maxiter) - true_) ** 2)))
    costs = np.asarray(sweep(alphas))
    pr = np.asarray(parameter_range)
    for i in range(freq - 1, len(costs), freq):   # ref @info cadence (:103)
        print(f"Denoising parameter {pr[i]}: cost = {costs[i]}",
              file=sys.stderr)

    out = _out_dir(params)
    np.savez(os.path.join(out, f"{params.dataset_name}_cost.npz"),
             parameter_range=np.asarray(parameter_range), costs=costs)
    return costs


def generate_cost_plot(dataset_name):
    """ref src/BPLDenoising.jl:113-125."""
    dataset_name = full_datasetname(dataset_name)
    path = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_cost.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No cost calculation found at {path}")
    z = np.load(path)
    base = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_cost_plot")
    plot_cost_curve(z["parameter_range"], z["costs"], base)
    return base


def generate_scalar_tv_cost(dataset_name, parameter_range, *, num_samples=1,
                            **kw):
    """ref src/BPLDenoising.jl:128-130."""
    return generate_cost(dataset_name, parameter_range,
                         num_samples=num_samples, **kw)


def generate_2d_cost(dataset_name, parameter_range_1, parameter_range_2, *,
                     num_samples=1, maxiter=10000, dtype="float64"):
    """2-D cost landscape over (α₁, α₂)·ones(2,1) patch maps
    (ref ``generate_2d_cost``, src/BPLDenoising.jl:136-160); one vmapped
    batched solve over the flattened grid."""
    params = _canon(merge(default_params, dataset_name=dataset_name,
                          num_samples=num_samples, dtype=dtype))
    true_, data = _load(params)
    r1 = np.asarray(parameter_range_1, dtype=np.float64)
    r2 = np.asarray(parameter_range_2, dtype=np.float64)
    A1, A2 = np.meshgrid(r1, r2, indexing="ij")
    pairs = jnp.asarray(np.stack([A1.ravel(), A2.ravel()], axis=1),
                        true_.dtype)
    pop = PatchOp((2, 1), tuple(data.shape[-2:]))

    def one(pair):
        amap = pop.apply(pair[:, None])  # (2,1) patch → image map (ref :148)
        u = denoise_pdps(data, (amap,), _TV, maxiter=maxiter)
        return 0.5 * jnp.sum((u - true_) ** 2)

    costs = np.asarray(jax.jit(jax.vmap(one))(pairs)).reshape(A1.shape)
    out = _out_dir(params)
    np.savez(os.path.join(out, f"{params.dataset_name}_cost_2d.npz"),
             parameter_range_1=r1, parameter_range_2=r2, costs=costs)
    return costs


def generate_2d_cost_plot(dataset_name):
    """ref src/BPLDenoising.jl:160-178."""
    dataset_name = full_datasetname(dataset_name)
    path = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_cost_2d.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No cost calculation found at {path}")
    z = np.load(path)
    base = os.path.join(default_save_prefix, dataset_name,
                        f"{dataset_name}_cost_plot_2d")
    plot_cost_contour(z["parameter_range_1"], z["parameter_range_2"],
                      z["costs"], base)
    return base


def generate_2d_tv_cost(dataset_name, parameter_range_1, parameter_range_2,
                        *, num_samples=1, **kw):
    """ref src/BPLDenoising.jl:176-178."""
    return generate_2d_cost(dataset_name, parameter_range_1,
                            parameter_range_2, num_samples=num_samples, **kw)


# ---------------------------------------------------------------------------
# Result reporting
# ---------------------------------------------------------------------------

def _ssim_any(ref, img):
    """SSIM of a grayscale (M, N) or planar color (C, M, N) image — the
    color form is the per-channel mean (the common multichannel SSIM
    convention; the reference is grayscale-only)."""
    ref = np.asarray(ref)
    if ref.ndim == 3:
        return float(np.mean([ssim_np(ref[c], np.asarray(img)[c])
                              for c in range(ref.shape[0])]))
    return ssim_np(ref, img)


def _write_image(path, img):
    """Grayscale or planar-color PNG by shape."""
    img = np.asarray(img)
    if img.ndim == 3:
        write_png_color(path, img)
    else:
        write_png_gray(path, img)


def _write_quality_table(path: str, b, b_data, opt_img):
    """Per-image SSIM/PSNR table + means row (ref src/BPLDenoising.jl:195-215).

    Note: the reference's 3-map saver accumulates ``mean_psnr += mean_psnr``
    (src/BPLDenoising.jl:282) — a bug producing a zero mean; all variants
    here use the correct accumulation.
    """
    b = np.asarray(b)
    b_data = np.asarray(b_data)
    opt_img = np.asarray(opt_img)
    O = b.shape[0]
    with open(path, "w") as io:
        io.write("img_num \t orig_ssim \t orig_psnr \t out_ssim \t out_psnr\n")
        mean_ssim = mean_psnr = 0.0
        # host-side float64 metrics: device jnp runs are float32 unless
        # x64 is enabled, and report tables should not inherit that
        for i in range(O):
            noisy_ssim = _ssim_any(b[i], b_data[i])
            noisy_psnr = psnr_np(b[i], b_data[i])
            out_ssim = _ssim_any(b[i], opt_img[i])
            out_psnr = psnr_np(b[i], opt_img[i])
            io.write(f"{i + 1}\t {noisy_ssim} \t {noisy_psnr} \t "
                     f"{out_ssim} \t {out_psnr}\n")
            mean_ssim += out_ssim
            mean_psnr += out_psnr
        io.write(f"\t\t\t\t\t {mean_ssim / O}\t {mean_psnr / O}\n")
    return mean_ssim / O, mean_psnr / O


def _save_image_triplets(out_path, prefix, b, b_data, opt_img):
    for i in range(np.asarray(b).shape[0]):
        _write_image(os.path.join(out_path, f"{prefix}_true_{i + 1}.png"),
                     np.asarray(b)[i])
        _write_image(os.path.join(out_path, f"{prefix}_data_{i + 1}.png"),
                     np.asarray(b_data)[i])
        _write_image(os.path.join(out_path, f"{prefix}_reco_{i + 1}.png"),
                     np.asarray(opt_img)[i])


def save_results(params, b, b_data, x, opt_img, st):
    """Write perf log, quality table, PNG triplets and learned-parameter maps
    (ref ``save_results`` ×3, src/BPLDenoising.jl:185-299; dispatch on the
    parameter shape mirrors the reference's three methods)."""
    if not params.save_results:
        return
    out_path = _out_dir(params)
    prefix = params.save_prefix
    perffile = os.path.join(out_path, prefix + ".txt")
    qualityfile = os.path.join(out_path, prefix + "_quality.txt")
    print("Saving " + perffile, file=sys.stderr)
    write_log(perffile, st.log, f"# params = {dict(params)!r}, x = {x!r}")
    _write_quality_table(qualityfile, b, b_data, opt_img)
    _save_image_triplets(out_path, prefix, b, b_data, opt_img)

    x = np.asarray(x)
    if x.ndim == 2:  # patch α: normalized upsampled parameter PNG (ref :251-257)
        pop = PatchOp.for_image(x, np.asarray(b)[0])
        write_png_gray(os.path.join(out_path, prefix + "_par.png"),
                       linear_stretch(pop.apply(jnp.asarray(x))))
    elif x.ndim == 3:  # 3-map α (ref :291-298)
        pop = PatchOp.for_image(x[..., 0], np.asarray(b)[0])
        maps = np.stack([np.asarray(pop.apply(jnp.asarray(x[..., k])))
                         for k in range(x.shape[-1])], axis=-1)
        stretched = linear_stretch(maps)
        for k in range(x.shape[-1]):
            write_png_gray(
                os.path.join(out_path, f"{prefix}_par_{k + 1}.png"),
                stretched[..., k])


# ---------------------------------------------------------------------------
# Bilevel learning experiments
# ---------------------------------------------------------------------------

def _reject_flags(params, method, flags):
    for flag in flags:
        if params.get(flag):
            raise ValueError(
                f"{flag} is not supported with method='{method}' "
                "(the loop runs as one on-device computation)")


def _stretched_inputs(ds, stretch_all):
    """ref parity: scalar TV stretches u, b and b_noisy
    (src/BPLDenoising.jl:337-339); the patch/sumregs variants stretch only
    u (:370,:446,:478) — applied uniformly across method= variants so
    artifacts stay comparable."""
    if stretch_all:
        return tuple(linear_stretch(np.asarray(d)) for d in ds)
    return tuple(np.asarray(d) for d in ds)


def single_loop_log_every(outer: int) -> int:
    """Chunked-dispatch cadence for single-loop experiment runs (~20 log
    entries): real per-segment wall-clock + cost/gradient trajectories in
    the perf log — the same observability trade tr_fused makes."""
    return max(1, int(outer) // 20)


def single_loop_state(res, alpha0):
    """SingleLoopResult → (BilevelState with real telemetry, final ‖g‖).

    Log entries carry segment-end cumulative wall-clock, the true cost and
    hypergradient-norm trajectories and the last parameter step; the TR
    radius has no first-order analogue → NaN (honest over a fabricated
    zero).  Shared by every family's method='single_loop' dispatch."""
    from ..bilevel.harness import BilevelState
    from ..viz.log import BilevelLogEntry

    st = BilevelState()
    costs = np.asarray(res.cost_trajectory)
    gnorms = np.asarray(res.gnorm_trajectory)
    alphas = np.asarray(res.alpha_trajectory)
    x0 = np.asarray(alpha0, dtype=float)
    log_every = single_loop_log_every(len(costs))
    for i, c in enumerate(costs):
        if (i + 1) % log_every == 0 or i + 1 == len(costs):
            prev = alphas[i - 1] if i > 0 else x0
            step_norm = float(np.linalg.norm(np.ravel(alphas[i] - prev)))
            st.log.append(BilevelLogEntry(
                i + 1, float(res.times[i]), float(c), float(gnorms[i]),
                float("nan"), step_norm))
    g_norm = float(gnorms[-1]) if len(gnorms) else float("nan")
    return st, g_norm


def _run_single_loop(params, model_kind, stretch_all=False):
    """Single-loop first-order path behind the same experiment surface
    (beyond-reference capability; artifacts match the TR path's)."""
    _reject_flags(params, "single_loop",
                  ("checkpoint", "resume", "save_iterations", "inner_tol"))
    from ..bilevel.first_order import single_loop_learn
    from ..bilevel.harness import BilevelState
    from ..bilevel.trust_region import BilevelResult
    from ..models import sumregs_model, tv_model
    from ..viz.log import BilevelLogEntry

    mesh = None
    if params.get("data_parallel"):
        from ..parallel import make_batch_mesh
        mesh = make_batch_mesh()
    ds = _load(params)
    model = tv_model() if model_kind == "tv" else sumregs_model()
    outer = int(params.sl_outer)
    res = single_loop_learn(
        ds[0], ds[1], params.alpha0, model,
        outer=outer, n_inner=int(params.sl_inner),
        n_adj=int(params.sl_adj), lr=float(params.sl_lr), mesh=mesh,
        log_every=single_loop_log_every(outer))
    st, g_norm = single_loop_state(res, params.alpha0)
    out = BilevelResult(x=np.asarray(res.alpha), u=np.asarray(res.u),
                        state=st, cost=float(res.cost), g_norm=g_norm,
                        iterations=outer)
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u), st)
    return out


def _run_fused(params, model_kind, stretch_all=False):
    """Fused on-device trust-region path (method='tr_fused'): identical TR
    semantics to method='tr' but the whole outer loop is one device program
    — no per-iteration host round trips.  Fastest path on remote/tunneled
    accelerators.  With ``log_every=j`` (implied by checkpoint/resume/
    save_iterations) the loop runs in j-iteration segments with a host hop
    between them, restoring per-segment wall-clock logging, npz
    checkpointing and per-iterate PNG snapshots at ~1/j of the
    latency saving."""
    from ..bilevel.fused import bilevel_learn_fused
    from ..models import sumregs_model, tv_model

    backend = params.get("backend", "auto")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() != "cpu" else "jnp"
    mesh = None
    if params.get("data_parallel"):
        from ..parallel import make_batch_mesh
        mesh = make_batch_mesh()
    ds = _load(params)
    model = tv_model() if model_kind == "tv" else sumregs_model()
    # exact/regularized switch radius matches the host path per family
    # (ref: TV Δt=1e-6, sumregs Δt=1e-3 — src/SumRegsLearningFunction.jl:14)
    delta_t = 1e-6 if model_kind == "tv" else 1e-3

    (params, log_every, seg_cb, init_B, it_offset,
     init_entries) = _fused_observability(params)

    res = bilevel_learn_fused(
        ds, xinit=jnp.asarray(params.alpha0, ds[0].dtype), params=params,
        model=model, inner_maxiter=int(params.inner_maxiter),
        inner_tol=params.get("inner_tol"), backend=backend, mesh=mesh,
        delta_t=delta_t,
        log_every=None if log_every is None else int(log_every),
        segment_callback=seg_cb, init_B=init_B)
    out = _fused_to_result(res, it_offset=it_offset,
                           init_entries=init_entries)
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    save_results(params, b, b_noisy, out.x, linear_stretch(out.u),
                 out.state)
    return out


def _fused_observability(params):
    """Resume/checkpoint/per-iterate-snapshot hooks for the one-dispatch
    (fused) paths, shared by every model family.  The hooks run as a
    segment callback in chunked-dispatch mode (``log_every=j``; implied by
    any of checkpoint/resume/save_iterations).  Returns
    ``(params, log_every, seg_cb, init_B, it_offset, init_entries)`` —
    ``params`` gains the resumed ``alpha0``/``delta0``/reduced ``maxiter``.

    Carry layout contract (``bilevel/tr_core.py``):
    ``(it, x_flat, Bst, delta, fx, gx, u, state, log)``.
    """
    from ..viz.log import BilevelLogEntry

    log_every = params.get("log_every")
    wants_hops = any(params.get(k) for k in
                     ("checkpoint", "resume", "save_iterations"))
    if log_every is None and wants_hops:
        log_every = 5   # default segment length for observable runs
    out_dir = _out_dir(params)
    ckpt_path = os.path.join(out_dir, params.save_prefix + "_ckpt.npz")
    init_B = None
    init_entries: list = []
    it_offset = 0
    if params.get("resume"):
        from ..utils.checkpoint import load_checkpoint
        state = load_checkpoint(ckpt_path)
        if state is not None:
            params = params | dict(alpha0=state["x"],
                                   delta0=float(state["delta"]))
            it_offset = int(state["iteration"])
            if state.get("B") is not None and np.asarray(state["B"]).ndim == 2:
                init_B = state["B"]
            rows = state.get("log")
            if rows is not None and np.asarray(rows).size:
                init_entries = [BilevelLogEntry(int(r[0]), *map(float, r[1:]))
                                for r in np.asarray(rows)]
            print(f"resuming from {ckpt_path} (iteration {it_offset})",
                  file=sys.stderr)
            params = params | dict(
                maxiter=max(0, int(params.maxiter) - it_offset))
    writer = None
    if params.get("checkpoint") or params.get("resume"):
        writer = CheckpointWriter(ckpt_path)
    save_iter_fn = None
    if params.get("save_iterations"):
        def save_iter_fn(it, img):
            _write_image(
                os.path.join(out_dir, f"{params.save_prefix}_iter_{it}.png"),
                np.clip(img, 0, 1))

    param_shape = tuple(np.asarray(params.alpha0).shape)
    seg_cb = None
    if log_every is not None and (writer or save_iter_fn):
        def seg_cb(it, carry, elapsed):
            it_abs = it + it_offset
            if writer is not None:
                x_d, bst, delta_d, log_d = (carry[1], carry[2], carry[3],
                                            carry[8])
                x_h, delta_h, log_h = jax.device_get((x_d, delta_d, log_d))
                rows = [[e.iter, e.time, e.function_value, e.g_norm,
                         e.delta, e.step_norm] for e in init_entries]
                rows += [[i + 1 + it_offset, elapsed, float(log_h[i, 0]),
                          float(log_h[i, 1]), float(log_h[i, 2]),
                          float(log_h[i, 3])] for i in range(it)]
                # dense BFGS matrix is checkpointed; the L-BFGS state
                # (NamedTuple) is skipped, matching the host path
                B = (np.asarray(jax.device_get(bst))
                     if isinstance(bst, jnp.ndarray) else None)
                from ..utils.checkpoint import save_checkpoint
                save_checkpoint(ckpt_path,
                                x=np.asarray(x_h).reshape(param_shape),
                                delta=float(delta_h), B=B, log_rows=rows,
                                iteration=it_abs)
            if save_iter_fn is not None:
                save_iter_fn(it_abs, np.asarray(jax.device_get(carry[6][0])))

    return params, log_every, seg_cb, init_B, it_offset, init_entries


def _fused_to_result(res, *, it_offset: int = 0, init_entries=()):
    """FusedResult (device log matrix) → host BilevelResult with a
    BilevelState log matching the host loop's entry schema."""
    from ..bilevel.harness import BilevelState
    from ..bilevel.trust_region import BilevelResult
    from ..viz.log import BilevelLogEntry

    st = BilevelState()
    st.log.extend(init_entries)
    k = int(res.iterations)
    log = np.asarray(res.log)
    times = (np.asarray(res.times) if res.times is not None
             else np.zeros(k))
    for i in range(k):
        entry = BilevelLogEntry(i + 1 + it_offset, float(times[i]),
                                float(log[i, 0]), float(log[i, 1]),
                                float(log[i, 2]), float(log[i, 3]))
        if log.shape[1] >= 6:   # adjoint-CG telemetry columns (tr_core)
            entry.adjoint_cg_iters = float(log[i, 4])
            entry.adjoint_cg_converged = float(log[i, 5])
        st.log.append(entry)
    return BilevelResult(x=np.asarray(res.x), u=np.asarray(res.u), state=st,
                         cost=float(res.cost), g_norm=float(res.g_norm),
                         iterations=k + it_offset)


def _run_bilevel(params, learning_function, visualise, stretch_all=False):
    ds = _load(params)
    ckpt = None
    ckpt_path = os.path.join(_out_dir(params),
                             params.save_prefix + "_ckpt.npz")
    init_B = None
    init_log = None
    if params.get("resume"):
        # resume from the last accepted iterate (capability the reference
        # lacks; SURVEY.md §5 checkpoint/resume)
        from ..utils.checkpoint import load_checkpoint
        from ..viz.log import BilevelLogEntry
        state = load_checkpoint(ckpt_path)
        if state is not None:
            params = params | dict(alpha0=state["x"],
                                   delta0=float(state["delta"]))
            if state.get("B") is not None and np.asarray(state["B"]).ndim == 2:
                init_B = state["B"]
            rows = state.get("log")
            if rows is not None and np.asarray(rows).size:
                init_log = [BilevelLogEntry(int(r[0]), *map(float, r[1:]))
                            for r in np.asarray(rows)]
            print(f"resuming from {ckpt_path} "
                  f"(iteration {int(state['iteration'])})", file=sys.stderr)
    if params.get("checkpoint") or params.get("resume"):
        ckpt = CheckpointWriter(ckpt_path)
    save_iter_fn = None
    if params.get("save_iterations"):
        out = _out_dir(params)

        def save_iter_fn(it, img):
            _write_image(
                os.path.join(out, f"{params.save_prefix}_iter_{it}.png"),
                np.clip(img, 0, 1))

    res = bilevel_learn(ds, learning_function, xinit=params.alpha0,
                        params=params, visualise=visualise,
                        save_iteration_fn=save_iter_fn, checkpoint=ckpt,
                        init_B=init_B, init_log=init_log)
    b, b_noisy = _stretched_inputs(ds, stretch_all)
    u = linear_stretch(np.asarray(res.u))
    save_results(params, b, b_noisy, res.x, u, res.state)
    return res


def scalar_bilevel_tv_learn(visualise: bool = False, **kwargs):
    """ref src/BPLDenoising.jl:325-344."""
    params = merge(default_params, bilevel_params, kwargs)
    params = _canon(params)
    params = params | dict(save_prefix="tv_optimal_parameter_scalar_"
                           + params.dataset_name)
    if params.get("method") == "single_loop":
        return _run_single_loop(params, "tv", stretch_all=True)
    if params.get("method") == "tr_fused":
        return _run_fused(params, "tv", stretch_all=True)
    lf = _make_lf(params, make_tv_learning_function)
    return _run_bilevel(params, lf, visualise, stretch_all=True)


def patch_bilevel_tv_learn(visualise: bool = False, **kwargs):
    """ref src/BPLDenoising.jl:359-376."""
    params = merge(default_params, patch_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.asarray(params.alpha0).shape)
    params = params | dict(
        save_prefix=f"tv_optimal_parameter_{shape}_" + params.dataset_name)
    if params.get("method") == "single_loop":
        return _run_single_loop(params, "tv")
    if params.get("method") == "tr_fused":
        return _run_fused(params, "tv")
    lf = _make_lf(params, make_tv_learning_function)
    return _run_bilevel(params, lf, visualise)


def scalar_bilevel_sumregs_learn(visualise: bool = False, **kwargs):
    """ref src/BPLDenoising.jl:432-449."""
    params = merge(default_params, sumregs_bilevel_params, kwargs)
    params = _canon(params)
    params = params | dict(save_prefix="sumregs_optimal_parameter_scalar_"
                           + params.dataset_name)
    if params.get("method") == "single_loop":
        return _run_single_loop(params, "sumregs")
    if params.get("method") == "tr_fused":
        return _run_fused(params, "sumregs")
    lf = _make_lf(params, make_sumregs_learning_function)
    return _run_bilevel(params, lf, visualise)


def patch_bilevel_sumregs_learn(image_pair=None, dataset_name=None,
                                visualise: bool = False, **kwargs):
    """ref src/BPLDenoising.jl:464-501 (both methods: dataset-name form and
    explicit image-pair form)."""
    params = merge(default_params, patch_sumregs_bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.asarray(params.alpha0).shape)
    if dataset_name is not None:
        params = _canon(params | dict(dataset_name=dataset_name))
    params = params | dict(
        save_prefix=f"sumregs_optimal_parameter_patch_{shape}"
        + params.dataset_name)
    if params.get("method") == "single_loop" and image_pair is None:
        return _run_single_loop(params, "sumregs")
    if params.get("method") == "tr_fused" and image_pair is None:
        return _run_fused(params, "sumregs")
    lf = _make_lf(params, make_sumregs_learning_function)
    if image_pair is not None:
        dt = _np_dtype(params)
        b = jnp.asarray(image_pair[0], dt)[None]
        b_noisy = jnp.asarray(image_pair[1], dt)[None]
        ds = (b, b_noisy)
        res = bilevel_learn(ds, lf, xinit=params.alpha0, params=params,
                            visualise=visualise)
        save_results(params, linear_stretch(np.asarray(b)),
                     linear_stretch(np.asarray(b_noisy)), res.x,
                     linear_stretch(np.asarray(res.u)), res.state)
        return res
    return _run_bilevel(params, lf, visualise)


# ---------------------------------------------------------------------------
# Validation (re-denoise at a fixed learned parameter)
# ---------------------------------------------------------------------------

def _validate(params, u, img, noisy):
    out_path = _out_dir(params)
    qualityfile = os.path.join(out_path,
                               params.save_prefix + "_quality.txt")
    mean_ssim, mean_psnr = _write_quality_table(qualityfile, img, noisy, u)
    _save_image_triplets(out_path, params.save_prefix, img, noisy, u)
    return mean_ssim, mean_psnr


def validate_tv_parameter(parameter, **kwargs):
    """ref src/BPLDenoising.jl:381-415: one TVDenoise at the learned α
    (maxiter 10000) + quality table.  Uses the full dataset stack (the
    reference skips the num_samples slice here too)."""
    params = merge(default_params, bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.shape(parameter))
    params = params | dict(
        save_prefix=f"val_tv_optimal_parameter_scalar_{shape}_"
        + params.dataset_name)
    img, noisy = testdataset(params.dataset_name)
    dt = _np_dtype(params)
    u = np.asarray(TVDenoise(jnp.asarray(noisy, dt), parameter))
    cost = L2CostFunction(u, img)
    print(f"Denoising parameter {parameter}: cost = {cost}",
          file=sys.stderr)
    mean_ssim, mean_psnr = _validate(params, u, img, noisy)
    return dict(cost=cost, mean_ssim=mean_ssim, mean_psnr=mean_psnr, u=u)


def validate_sumregs_parameter(parameter, **kwargs):
    """ref src/BPLDenoising.jl:506-539."""
    params = merge(default_params, bilevel_params, kwargs)
    params = _canon(params)
    shape = tuple(np.shape(parameter))
    params = params | dict(
        save_prefix=f"val_sumregs_optimal_parameter_scalar_{shape}_"
        + params.dataset_name)
    img, noisy = testdataset(params.dataset_name)
    dt = _np_dtype(params)
    # denoise only (the reference calls the full learning function here,
    # src/BPLDenoising.jl:517, computing and discarding a hypergradient —
    # same u, half the work); patch (m, n, 3) parameters upsample first
    from ..models import sumregs_model
    param = np.asarray(parameter)
    if param.ndim == 3:
        pop = PatchOp.for_image(param[..., 0], noisy[0])
        alphas = tuple(pop.apply(jnp.asarray(param[..., k], dt))
                       for k in range(param.shape[-1]))
    else:
        alphas = jnp.asarray(param, dt)
    u = np.asarray(denoise_pdps(jnp.asarray(noisy, dt), alphas,
                                sumregs_model(), maxiter=5000))
    cost = l2_cost(u, img)
    print(f"Denoising parameter {parameter}: cost = {float(cost)}",
          file=sys.stderr)
    mean_ssim, mean_psnr = _validate(params, u, img, noisy)
    return dict(cost=float(cost), mean_ssim=mean_ssim, mean_psnr=mean_psnr,
                u=u)
