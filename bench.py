#!/usr/bin/env python
"""Benchmark: full scalar bilevel TV learning on faces_train_128_10 (TPU).

Runs the reference's flagship workload (SURVEY.md §6 north star: wall-clock
to learned α on ``faces_train_128_10`` — trust-region outer loop, PDPS inner
solves on the (10, 128, 128) stack, exact active-set hypergradients)
end-to-end on the available accelerator and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

The headline ``value`` is the fused on-device trust-region path
(``method='tr_fused'``: whole outer loop in one XLA computation,
warm-started early-stopped inner solves) at verified parity — the JSON also
carries ``learned_alpha``/``mean_psnr_db`` so fidelity regressions show up,
plus secondary walltimes: the host-driven TR loop (one dispatch per
evaluation — reference-style architecture), parity mode (cold fixed-budget
solves, exact reference semantics), the patch-TV and sumregs families, the
single-loop first-order method, and a phase breakdown (inner solve /
hypergradient, cold and warm).

``vs_baseline`` is speedup vs the same workload executed by this framework's
jnp path on the build host's CPU in float64 (multithreaded XLA:CPU — a
*conservative* stand-in for the single-process Julia reference, which
publishes no numbers; see BASELINE.md).  Baseline constant measured via
``python bench.py --measure-baseline`` on the build host.

Usage:
    python bench.py              # TPU benchmark (one JSON line on stdout)
    python bench.py --quick      # reduced budgets (smoke test)
    python bench.py --measure-baseline   # re-measure the CPU reference time
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Measured on the build host (see BASELINE.md "Measured baselines"):
# CPU f64, jnp path, full bilevel learn on faces_train_128_10 (maxiter=20,
# stop via Δ < tol).  The round-1 constant was measured with the cheaper
# penalty hypergradient; the current code (bias-free augmented-Lagrangian
# hypergradient) costs more on CPU, so both ratios are reported:
# ``vs_baseline`` against the current-code CPU time, ``vs_baseline_r1``
# against the historical round-1 constant (keeps rounds comparable).
CPU_BASELINE_SECONDS = 354.76   # round-3 re-measure (AL hypergradient)
CPU_BASELINE_R1_SECONDS = 214.63  # round-1 (penalty hypergradient)

FLAGSHIP_ALPHA = 0.069788      # round-1 f32 reference value (parity target)


def _params(outer_maxiter: int):
    from bpldenoising_tpu.utils.config import Params
    return Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                  maxiter=outer_maxiter, tol=1e-5, verbose_iter=0)


def _dataset(dtype_name: str):
    import jax.numpy as jnp
    from bpldenoising_tpu.data import testdataset
    true_, noisy = testdataset("faces_train_128_10")
    dt = jnp.dtype(dtype_name)
    return (jnp.asarray(true_, dt), jnp.asarray(noisy, dt))


def _sync(out):
    """Barrier that is trustworthy through the tunneled device.

    ``jax.block_until_ready`` has been observed to under-wait for some
    Pallas executables here (BASELINE.md "tunnel timing" note); an
    on-device scalar reduction + 4-byte host transfer of the first
    floating-point leaf cannot lie.  Costs one dispatch (~the
    ``dispatch_latency_s`` floor), which is why every timed region below
    ends with exactly one of these.
    """
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(out)   # all leaves
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.inexact):
            float(jnp.sum(leaf))
            break
    return out


def _floor_sub(wall: float, floor: float):
    """Floor-subtracted device time, or None when the measurement is
    dispatch-dominated: if subtracting the interleaved trivial-dispatch
    floor leaves under 10% of the wall, the device time is below the
    tunnel's measurement resolution and a rate computed from it would be
    garbage (observed: a quick-mode run emitting 2e8 Gpix/s).  Callers
    must skip the ``_device`` twin on None."""
    dev = wall - floor
    if dev <= 0.1 * wall:
        return None
    return dev


def _sweep_score(primary, out, extra_keys):
    """Composite value for ``--only`` sweep mode (scripts/pin_schedule.py):
    the section's primary device time plus every swept-kernel walltime the
    section measured, so a schedule-salt candidate is judged on ALL the
    kernel families it pins, not just the solver.  A missing extra (that
    sub-bench failed) contributes a large penalty — a crash must never
    make a candidate look fast."""
    total = primary or 0.0
    for k in extra_keys:
        v = out.get(k)
        total += float(v) if v is not None else 1e3
    return round(total, 4)


def _best_of(fn, n=2):
    """The tunneled device shows large run-to-run contention variance; the
    min over repeated runs measures capability, not interference.  ``fn``
    must build any warm-start state itself (cold-state semantics are the
    caller's responsibility — see the host-TR metric, which rebuilds its
    learning function per run).  Timed regions end with a scalar-reduce
    sync (see ``_sync``); each reported walltime therefore includes one
    extra sync dispatch on top of the work itself."""
    out = _sync(fn())    # compile + warm the dispatch path
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return out, best


def run(quick: bool = False, backend: str = "pallas",
        dtype_name: str = "float32", only: str | None = None) -> dict:
    """Full benchmark (``only=None``) or one section of it.

    ``only`` ∈ {"flagship", "one_kernel", "throughput"} runs just that
    kernel family's measurements and returns a partial dict —
    ``scripts/pin_schedule.py`` uses these modes to sweep each family's
    schedule salt at EXACTLY the call sites the full bench uses (the
    persistent-cache key is call-site-sensitive, so entries produced
    anywhere else would never be reloaded by the driver's full run).
    Sections are gated at runtime — never by moving code — so every mode
    shares the same file/line call sites.
    """
    # pinned executables: reload the known-fast serialized binaries (and the
    # schedule salts that select them) instead of re-drawing Mosaic's
    # compile lottery — see utils/compile_cache.py + scripts/pin_schedule.py
    from bpldenoising_tpu.utils.compile_cache import enable
    cache_dir = enable()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bpldenoising_tpu.bilevel import bilevel_learn, bilevel_learn_fused
    from bpldenoising_tpu.learning import (make_sumregs_learning_function,
                                           make_tv_learning_function)
    from bpldenoising_tpu.metrics import psnr
    from bpldenoising_tpu.models import sumregs_model, tv_model
    from bpldenoising_tpu.solvers import denoise_pdps
    from bpldenoising_tpu.solvers.hypergrad import (HypergradConfig,
                                                    exact_hypergrad)
    from bpldenoising_tpu.solvers.pdps_pallas import denoise_pdps_pallas

    inner = 500 if quick else 5000
    outer = 3 if quick else 20
    ds = _dataset(dtype_name)
    params = _params(outer)
    model = tv_model()
    ksolve = (denoise_pdps_pallas if backend == "pallas" else denoise_pdps)
    float(jnp.zeros(()))   # warm the tunnel's first device→host transfer

    # dispatch+sync floor of the (possibly tunneled) device: every
    # standalone walltime below includes one of these; the fused paths pay
    # it once per RUN, the host path once per TR evaluation
    trivial = jax.jit(lambda x: x + 1.0)
    _, dispatch_s = _best_of(lambda: trivial(ds[1]), n=3)

    out = {
        "metric": "bilevel_tv_walltime_faces_train_128_10",
        "unit": "s",
        "dispatch_latency_s": round(dispatch_s, 4),
        "backend": backend,
        "dtype": dtype_name,
        "device": str(jax.devices()[0]),
        "salts": {k[len("BPL_MOSAIC_SALT"):].lstrip("_"): v
                  for k, v in sorted(os.environ.items())
                  if k.startswith("BPL_MOSAIC_SALT")},
        "compile_cache": os.path.basename(cache_dir),
        "quick": quick,
        # schema note: every timed region syncs via a scalar reduce (r3
        # "Timing hardening", BASELINE.md) and every rate metric carries a
        # raw form plus a `_device` twin with the interleaved
        # trivial-dispatch floor subtracted — raw = end-to-end through the
        # tunnel, _device = device execution only
        "timing_semantics": "r3-floor-subtracted",
    }
    if only:
        out["only"] = only
    scale = 1.0 if not quick else (5000 / inner) * (20 / outer)
    fast_cfg = HypergradConfig(al_iters=2, cg_maxiter=100)

    def _sumregs_eval(x):
        # oracle-grade scoring: full cold 5000-iter solve, so tr_fused and
        # one-kernel αs are judged by the same solve, not their own
        # (warm/approximate) u
        u = ksolve(ds[1], np.asarray(x), sumregs_model(), maxiter=inner)
        cost = 0.5 * float(jnp.sum((u - ds[0]) ** 2))
        return cost, float(np.mean(np.asarray(psnr(ds[0], u))))

    # --- headline: fused on-device TR (fast mode, fidelity-checked) -------
    # Speed-mode inner budget (round-5 sweep): inner_tol=5e-6 with a
    # check_every=50 convergence cadence.  The round-4 budget (1e-6 / 100)
    # OVER-converged the warm inner solves — the sweep measured identical
    # PSNR (27.386) and final cost at every tolerance in [1e-6, 2e-5],
    # while 5e-6/50 lands 1.7× faster (0.048 s vs 0.081 s device) with α
    # parity 8.4e-7 vs the round-1 target (12× TIGHTER than 1e-6/100's
    # 1.04e-5 — f32 α lands inside a ±2e-5 noise band regardless of inner
    # tolerance, so extra inner iterations buy nothing).  Parity mode
    # below is untouched: cold fixed-budget reference semantics.
    FAST_INNER_TOL, FAST_CHECK_EVERY = 5e-6, 50
    if only in (None, "flagship"):
        def run_fused(inner_tol, cfg, check_every=100):
            return bilevel_learn_fused(ds, xinit=0.1, params=params,
                                       inner_maxiter=inner,
                                       inner_tol=inner_tol,
                                       check_every=check_every, cfg=cfg,
                                       backend=backend)

        def run_fast():
            return run_fused(FAST_INNER_TOL, fast_cfg,
                             check_every=FAST_CHECK_EVERY)

        # interleave trivial-dispatch probes with the flagship repeats: the
        # tunnel's round-trip floor drifts on a minutes timescale, so the
        # subtraction baseline must be sampled AT the flagship measurement,
        # not at bench start
        res = _sync(run_fast())   # compile + warm
        wall = flag_floor = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            _sync(trivial(ds[1]))
            flag_floor = min(flag_floor, time.perf_counter() - t0)
            t0 = time.perf_counter()
            res = _sync(run_fast())
            wall = min(wall, time.perf_counter() - t0)
        learned_alpha = float(res.x)
        # headline value = DEVICE execution walltime: the raw wall ends
        # with a scalar-reduce sync whose tunnel round-trip (~25-70 ms,
        # drifting on a minutes timescale) is a third of the total and the
        # only remaining run-to-run variance now that executables are
        # pinned; flag_floor is sampled interleaved with the repeats so
        # the subtraction isolates device work from tunnel state.  The raw
        # wall (what a tunneled caller would experience end-to-end) is
        # value_raw_s.
        # degenerate subtraction (dispatch-dominated wall) falls back to
        # the raw wall — a conservative honest headline, never a garbage one
        dev_wall = _floor_sub(wall, flag_floor) or wall
        out.update({
            "value": round(dev_wall, 4),
            "vs_baseline": round(
                CPU_BASELINE_SECONDS / (dev_wall * scale), 2),
            "vs_baseline_r1": round(
                CPU_BASELINE_R1_SECONDS / (dev_wall * scale), 2),
            "value_raw_s": round(wall, 4),
            "dispatch_at_flagship_s": round(flag_floor, 4),
            "learned_alpha": round(learned_alpha, 6),
            "alpha_vs_parity_target": round(
                abs(learned_alpha - FLAGSHIP_ALPHA), 8),
            "mean_psnr_db": round(float(np.mean(np.asarray(
                psnr(ds[0], res.u)))), 3),
            "final_cost": round(float(res.cost), 4),
            "outer_iterations": int(res.iterations),
        })
        # in-loop adjoint-CG guard (VERDICT r4 #4): the fused log carries
        # per-TR-iteration CG iters/converged (tr_core.py columns 4-5) —
        # the WARM in-loop behaviour, not a cold probe.  A regression that
        # makes the warm-chained adjoint hit its cg_maxiter=100 cap flips
        # flagship_adjoint_cg_all_converged here.
        lg = np.asarray(res.log)[: int(res.iterations)]
        cg_it, cg_cv = lg[:, 4], lg[:, 5]
        cg_m = ~np.isnan(cg_it)
        if cg_m.any():
            out["flagship_adjoint_cg_max_iters"] = int(np.max(cg_it[cg_m]))
            out["flagship_adjoint_cg_all_converged"] = bool(
                np.all(cg_cv[cg_m] > 0.5))
            if not out["flagship_adjoint_cg_all_converged"]:
                out["warning_flagship_cg_capped"] = (
                    "warm in-loop adjoint CG hit cg_maxiter - hypergradient "
                    "accuracy is no longer guaranteed by warm chaining")
        if only == "flagship":
            return out

        # --- parity mode: cold fixed-budget solves (reference semantics) --
        res_par, wall_parity = _best_of(
            lambda: run_fused(None, HypergradConfig()))

        # --- host-driven TR (one dispatch per evaluation) ------------------
        # the learning function is rebuilt per run so each timed run pays
        # the cold warm-start state (a fresh user invocation reproduces it)
        def run_host():
            lf = make_tv_learning_function(
                maxiter=inner, backend=backend, solver_kwargs=dict(tol=1e-6))
            return bilevel_learn(ds, lf, xinit=0.1, params=params)

        res_host, wall_host = _best_of(run_host)

        # --- family walltimes: patch TV and sumregs (fused path) ----------
        def run_patch():
            return bilevel_learn_fused(
                ds, xinit=1e-4 * np.ones((2, 2)),
                params=params | dict(delta0=1e-4),
                inner_maxiter=inner, inner_tol=1e-6, check_every=100,
                cfg=fast_cfg, backend=backend)

        res_patch, wall_patch = _best_of(run_patch)

        def run_sumregs():
            return bilevel_learn_fused(
                ds, xinit=np.array([1e-3, 1e-3, 1e-3]),
                params=params | dict(delta0=0.01), model=sumregs_model(),
                inner_maxiter=inner, inner_tol=1e-6, check_every=100,
                cfg=fast_cfg, backend=backend, delta_t=1e-3)

        res_sr, wall_sumregs = _best_of(run_sumregs)

        # sumregs quality at the learned α (VERDICT r2 item 3)
        sumregs_cost, sumregs_psnr = _sumregs_eval(res_sr.x)

        # --- single-loop first-order (jnp scan) ----------------------------
        from bpldenoising_tpu.bilevel.first_order import single_loop_tv_learn

        def run_sl():
            return single_loop_tv_learn(ds[0], ds[1], alpha0=0.1, outer=300,
                                        n_inner=40, n_adj=10, lr=0.05)

        r_sl, single_loop_wall = _best_of(run_sl)

        out.update({
            "tr_parity_walltime_s": round(wall_parity, 4),
            "tr_parity_alpha": round(float(res_par.x), 6),
            "tr_host_walltime_s": round(wall_host, 4),
            "tr_host_alpha": round(float(res_host.x), 6),
            "patch_tv_walltime_s": round(wall_patch, 4),
            "patch_tv_iterations": int(res_patch.iterations),
            "sumregs_walltime_s": round(wall_sumregs, 4),
            "sumregs_alpha": [round(float(a), 6)
                              for a in np.asarray(res_sr.x)],
            "sumregs_final_cost": round(sumregs_cost, 4),
            "sumregs_psnr_db": round(sumregs_psnr, 3),
            "single_loop_walltime_s": round(single_loop_wall, 4),
            "single_loop_alpha": round(float(r_sl.alpha), 6),
            "single_loop_mean_psnr_db": round(float(np.mean(np.asarray(
                psnr(ds[0], r_sl.u)))), 3),
        })

    # --- fully-fused one-kernel learners -----------------------------------
    if only in (None, "one_kernel"):
        try:
            from bpldenoising_tpu.bilevel.first_order_pallas import (
                single_loop_tv_pallas)

            def run_ok():
                a1, u1, _ = single_loop_tv_pallas(
                    ds[0], ds[1], alpha0=0.1, outer=300, n_inner=40,
                    n_adj=10, lr=0.05)
                return a1

            a1, one_kernel_wall = _best_of(run_ok)
            one_kernel_alpha = float(a1)
        except Exception as e:   # e.g. VMEM guard on larger configs
            print(f"one-kernel learner unavailable: {e}", file=sys.stderr)
            one_kernel_wall = None
            one_kernel_alpha = None

        # one-kernel sumregs: the FULL batch-10 faces stack (recompute mode
        # fits the K=3 state in VMEM)
        try:
            from bpldenoising_tpu.bilevel.first_order_pallas import (
                single_loop_pallas)

            def run_ok_sr():
                x, u1, _ = single_loop_pallas(
                    ds[0], ds[1], jnp.asarray([1e-3, 1e-3, 1e-3],
                                              ds[0].dtype),
                    sumregs_model(), outer=300, n_inner=40, n_adj=10,
                    lr=0.05)
                return x

            x_sr, one_kernel_sr_wall = _best_of(run_ok_sr)
            one_kernel_sr_alpha = [round(float(v), 6)
                                   for v in np.asarray(x_sr)]
            if only is None:   # fidelity scoring: skip in sweep mode
                ok_sr_cost, ok_sr_psnr = _sumregs_eval(x_sr)
            else:
                ok_sr_cost = ok_sr_psnr = None
        except Exception as e:
            print(f"one-kernel sumregs unavailable: {e}", file=sys.stderr)
            one_kernel_sr_wall = None
            one_kernel_sr_alpha = None
            ok_sr_cost = ok_sr_psnr = None

        # batch-tiled one-kernel at scale: batch-64 K=3 — beyond any
        # VMEM-resident capacity; solver state rides an HBM buffer, DMA'd
        # per (outer step, tile)
        try:
            from bpldenoising_tpu.bilevel.first_order_pallas import (
                single_loop_pallas_tiled)

            big64 = (jnp.tile(ds[0], (7, 1, 1))[:64],
                     jnp.tile(ds[1], (7, 1, 1))[:64])

            def run_ok_tiled():
                x, u1, _ = single_loop_pallas_tiled(
                    big64[0], big64[1], jnp.asarray([1e-3, 1e-3, 1e-3],
                                                    ds[0].dtype),
                    sumregs_model(), outer=300, n_inner=40, n_adj=10,
                    lr=0.05)
                return x

            _, tiled64_wall = _best_of(run_ok_tiled)
        except Exception as e:
            print(f"tiled one-kernel unavailable: {e}", file=sys.stderr)
            tiled64_wall = None

        out.update({
            "one_kernel_walltime_s": (
                round(one_kernel_wall, 4)
                if one_kernel_wall is not None else None),
            "one_kernel_alpha": one_kernel_alpha,
            "one_kernel_sumregs_walltime_s": (
                round(one_kernel_sr_wall, 4)
                if one_kernel_sr_wall is not None else None),
            "one_kernel_sumregs_alpha": one_kernel_sr_alpha,
            "one_kernel_sumregs_final_cost": (
                round(ok_sr_cost, 4) if ok_sr_cost is not None else None),
            "one_kernel_sumregs_psnr_db": (
                round(ok_sr_psnr, 3) if ok_sr_psnr is not None else None),
            "one_kernel_tiled_batch64_sumregs_s": (
                round(tiled64_wall, 4) if tiled64_wall is not None
                else None),
        })
        if only == "one_kernel":
            # sweep score: sum of the family's walltimes (all three live in
            # their own modules, so one salt draws them together)
            parts = [w for w in (one_kernel_wall, one_kernel_sr_wall,
                                 tiled64_wall) if w is not None]
            out["value"] = round(sum(parts), 4) if parts else None
            return out

    # --- phase breakdown (per-evaluation costs at the optimum) ------------
    if only is None:
        alpha = jnp.asarray(learned_alpha, ds[0].dtype)

        # probes run at the flagship's speed-mode inner budget so the
        # phase numbers decompose the headline, not a stricter solve
        if backend == "pallas":
            def solve_state(a, state0=None):
                return denoise_pdps_pallas(ds[1], (a,), model,
                                           maxiter=inner, tol=FAST_INNER_TOL,
                                           check_every=FAST_CHECK_EVERY,
                                           state0=state0, return_state=True)
        else:
            def solve_state(a, state0=None):
                u, ys, _ = denoise_pdps(ds[1], (a,), model, maxiter=inner,
                                        tol=FAST_INNER_TOL,
                                        check_every=FAST_CHECK_EVERY,
                                        state0=state0, return_dual=True)
                return u, (u, ys)

        (u_opt, st_opt), solve_cold_s = _best_of(lambda: solve_state(alpha))
        _, solve_warm_s = _best_of(
            lambda: solve_state(alpha * 1.05, state0=st_opt))

        hg = jax.jit(lambda u, t: exact_hypergrad(u, t, (alpha,), model,
                                                  fast_cfg)[0][0])
        _, hypergrad_s = _best_of(lambda: hg(u_opt, ds[0]))
        # adjoint-CG convergence at the learned α (a solve silently hitting
        # cg_maxiter would poison the hypergradient — surface it here the
        # way the learning-function factories do, utils/telemetry.py).
        # Two probes: the speed-mode cfg the fused loop actually uses
        # (cg_maxiter=100 COLD — expected unconverged; the loop's
        # warm-started adjoint carry makes up the accuracy across TR
        # iterations, FIDELITY.md) and an accuracy-grade full-budget solve
        # (must converge, else the hypergradient itself is suspect).
        def probe(cfg):
            _, _, info = jax.jit(lambda u, t: exact_hypergrad(
                u, t, (alpha,), model, cfg))(u_opt, ds[0])
            it, conv = jax.device_get((info.iters, info.converged))
            return int(np.max(it)), bool(np.all(conv))

        fast_it, fast_conv = probe(fast_cfg)
        acc_it, acc_conv = probe(HypergradConfig())

        out.update({
            "phase_solve_cold_s": round(solve_cold_s, 4),
            "phase_solve_warm_s": round(solve_warm_s, 4),
            "phase_hypergrad_s": round(hypergrad_s, 4),
            "adjoint_cg_iters_speed_cfg_cold": fast_it,
            "adjoint_cg_converged_speed_cfg_cold": fast_conv,
            "adjoint_cg_iters": acc_it,
            "adjoint_cg_converged": acc_conv,
        })
        if not acc_conv:   # VERDICT r4 #4: this probe MUST converge
            out["warning_accuracy_cg_unconverged"] = (
                "full-budget adjoint CG did not converge at the learned "
                "alpha - the exact hypergradient itself is suspect")

    # --- raw fused-kernel PD throughput ------------------------------------
    if only in (None, "throughput"):
        bench_iters = 1000 if quick else 5000
        run_pd = lambda: ksolve(ds[1], (0.1,), model, maxiter=bench_iters)
        _sync(run_pd())   # compile + warm
        pd_wall = pd_floor = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(trivial(ds[1]))
            pd_floor = min(pd_floor, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _sync(run_pd())
            pd_wall = min(pd_wall, time.perf_counter() - t0)
        pd_rate = bench_iters / pd_wall
        # _device twin: the batch-10 wall is dispatch-latency-bound on the
        # tunnel (the r2→r3 discontinuity in this metric was the timing
        # hardening, not a regression) — the floor-subtracted form tracks
        # the device across rounds
        pd_dev = _floor_sub(pd_wall, pd_floor)
        pd_rate_dev = bench_iters / pd_dev if pd_dev else None

        # throughput at scale: batch-256 stack (the batch-10 number is
        # dispatch-latency-bound; this one saturates the chip).  The
        # trivial-dispatch floor is re-sampled interleaved with the
        # repeats (as the flagship does): the ~25-50 ms tunnel round-trip
        # that the scalar-reduce sync adds is a third of this wall, so
        # device throughput must be computed from wall - floor.
        big = jnp.tile(ds[1], (26, 1, 1))[:256]
        scale_iters = 200 if quick else 3000
        run_big = lambda: ksolve(big, (0.1,), model, maxiter=scale_iters)
        _sync(run_big())   # compile + warm
        big_wall = big_floor = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(trivial(ds[1]))
            big_floor = min(big_floor, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _sync(run_big())
            big_wall = min(big_wall, time.perf_counter() - t0)
        big_device = _floor_sub(big_wall, big_floor)
        gpix_iter_rate = 256 * 128 * 128 * scale_iters / big_wall / 1e9
        gpix_iter_rate_dev = (256 * 128 * 128 * scale_iters / big_device
                              / 1e9 if big_device else None)

        # roofline: the fused PDPS iteration is pure elementwise/stencil
        # work (VPU-bound, VMEM-resident).  Audited op count per
        # pixel-iteration for K=1 (BASELINE.md "Roofline"): 32
        # arithmetic/select VPU ops + 6 roll shifts = 38; v5e VPU f32 peak
        # ≈ 8×128 lanes × 4 ALUs × ~0.94 GHz ≈ 3.85 Top/s.  Utilization is
        # a DEVICE property, so it uses the floor-subtracted rate.
        VPU_PEAK_F32 = 3.85e12
        flops_per_pix_iter = 38.0   # K=1, audited
        vpu_util_pct = (100.0 * gpix_iter_rate_dev * 1e9
                        * flops_per_pix_iter / VPU_PEAK_F32
                        if gpix_iter_rate_dev else None)

        # routing-ladder scaling points: whole-image VMEM residency at
        # 1024² and the spatially-tiled trapezoid kernel at 2048² (state
        # too large even for residency).  Regressions in the dispatch
        # ladder (8 MiB chunking → 48 MiB residency → tiling → jnp) move
        # these.
        resident_1024_wall = tiled_2048_wall = None
        if not quick and backend == "pallas":
            img1024 = jnp.tile(ds[1][:1], (1, 8, 8))
            _, resident_1024_wall = _best_of(
                lambda: ksolve(img1024, (0.1,), model, maxiter=5000))
            img2048 = jnp.tile(ds[1][:1], (1, 16, 16))
            _, tiled_2048_wall = _best_of(
                lambda: ksolve(img2048, (0.1,), model, maxiter=1000))

        out.update({
            "pd_iters_per_sec_batch10_128": round(pd_rate, 1),
            "pd_iters_per_sec_batch10_128_device": (
                round(pd_rate_dev, 1) if pd_rate_dev else None),
            "gpix_iter_per_sec_batch256_128": round(gpix_iter_rate, 2),
            "gpix_iter_per_sec_batch256_128_device": (
                round(gpix_iter_rate_dev, 2) if gpix_iter_rate_dev
                else None),
            "dispatch_at_batch256_s": round(big_floor, 4),
            "vpu_util_pct_batch256": (
                round(vpu_util_pct, 1) if vpu_util_pct else None),
            "resident_1024_walltime_s": (
                round(resident_1024_wall, 4)
                if resident_1024_wall is not None else None),
            "tiled_2048_walltime_s": (
                round(tiled_2048_wall, 4)
                if tiled_2048_wall is not None else None),
        })
        if only == "throughput":
            # sweep score: maximize batch-256 device throughput → minimize
            # the floor-subtracted wall (the tunnel's drifting round-trip
            # would otherwise dominate candidate ranking)
            out["value"] = round(big_device, 4)
            return out

    # --- TGV² (beyond-reference model family) ------------------------------
    if only in (None, "tgv"):
        from bpldenoising_tpu.learning import make_tgv_learning_function
        from bpldenoising_tpu.solvers.tgv_pallas import \
            tgv_denoise_pdps_pallas

        # bilevel learn: host TR loop, each evaluation = ONE dispatch
        # (fused-kernel 5000-iter solve + implicit-CG vjp in a single jit)
        tgv_lf = make_tgv_learning_function(maxiter=inner, backend=backend)
        tgv_params = _params(outer) | dict(delta0=0.02)
        tgv_x0 = np.array([0.05, 0.05])

        def run_tgv():
            res = bilevel_learn(ds, tgv_lf, xinit=tgv_x0,
                                params=tgv_params)
            _sync(res.u)
            return res

        res_tgv, tgv_wall = _best_of(run_tgv)
        tgv_psnr = float(np.mean(np.asarray(psnr(ds[0], res_tgv.u))))

        # fused TGV trust region: the ENTIRE outer loop as one dispatch
        # (warm-started inner solves + adjoint CG chained in the carry)
        from bpldenoising_tpu.bilevel.fused_tgv import bilevel_learn_tgv_fused

        # inner budget 3e-6/100 (round-5 sweep): 1.7× faster than the
        # round-4 1e-6/500 AND the learned pair lands on the host path's
        # α = [0.0855, 0.0441] (the tighter budget converged to a nearby
        # flat-valley point [0.0930, 0.0433] with cost lower by only 0.02%)
        def run_tgv_fused():
            res = bilevel_learn_tgv_fused(
                ds, xinit=tgv_x0, params=tgv_params, inner_maxiter=inner,
                inner_tol=3e-6, check_every=100, backend=backend)
            _sync(res.u)
            return res

        res_tgvf = tgv_fused_wall = None
        try:
            res_tgvf, tgv_fused_wall = _best_of(run_tgv_fused)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"tgv_fused failed: {e}", file=sys.stderr)

        # patch-TGV through the fused TR + map-weight kernel: (2, 2, 2)
        # weight grids upsampled to per-pixel maps riding VMEM.
        # (Defensive: first-TPU-exposure paths must not kill the whole
        # bench artifact if Mosaic rejects a schedule — degrade to null.)
        def run_tgv_patch():
            res = bilevel_learn_tgv_fused(
                ds, xinit=0.05 * jnp.ones((2, 2, 2), ds[0].dtype),
                params=tgv_params, inner_maxiter=inner, inner_tol=3e-6,
                check_every=100, backend=backend)
            _sync(res.u)
            return res

        tgv_patch_wall = None
        try:
            _, tgv_patch_wall = _best_of(run_tgv_patch)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"tgv_patch_fused failed: {e}", file=sys.stderr)

        # one-kernel single-loop TGV learner (single image, the whole
        # optimization VMEM-resident in one launch)
        tgv_ok_wall = None
        if backend == "pallas":
            from bpldenoising_tpu.bilevel.first_order_tgv_pallas import (
                single_loop_tgv_pallas)

            sl_outer = 60 if quick else 300

            def run_tgv_ok():
                a, u, _ = single_loop_tgv_pallas(
                    ds[0][0], ds[1][0], np.array([0.05, 0.05]),
                    outer=sl_outer, n_inner=40, n_adj=10, lr=0.02)
                _sync(u)
                return a

            try:
                _, tgv_ok_wall = _best_of(run_tgv_ok)
            except Exception as e:  # pragma: no cover - hardware-specific
                print(f"tgv_one_kernel failed: {e}", file=sys.stderr)

        # routing-ladder scaling point: 1024² TGV state (~80 MB) exceeds
        # both batch-chunk and residency budgets → the spatially-tiled
        # halo-chunk kernel
        tgv_tiled_1024_wall = None
        if not quick and backend == "pallas":
            try:
                img1024 = jnp.tile(ds[1][:1], (1, 8, 8))
                _, tgv_tiled_1024_wall = _best_of(
                    lambda: _sync(tgv_denoise_pdps_pallas(
                        img1024, 0.1, 0.2, maxiter=1000)[0]))
            except Exception as e:  # pragma: no cover - hardware-specific
                print(f"tgv_tiled_1024 failed: {e}", file=sys.stderr)

        # raw fused-kernel throughput at scale (floor-subtracted device
        # rate, same protocol as the TV batch-256 number; TGV state is
        # ~3× TV's so batch-64 already saturates the chip)
        tgv_big = jnp.tile(ds[1], (7, 1, 1))[:64]
        tgv_iters = 200 if quick else 2000
        if backend == "pallas":
            run_tgv_big = lambda: tgv_denoise_pdps_pallas(
                tgv_big, 0.1, 0.2, maxiter=tgv_iters)
        else:
            from bpldenoising_tpu.solvers import tgv_denoise_pdps
            run_tgv_big = lambda: tgv_denoise_pdps(
                tgv_big, 0.1, 0.2, maxiter=tgv_iters)
        _sync(run_tgv_big()[0])
        tgv_wall_big = tgv_floor = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(trivial(ds[1]))
            tgv_floor = min(tgv_floor, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _sync(run_tgv_big()[0])
            tgv_wall_big = min(tgv_wall_big, time.perf_counter() - t0)
        tgv_device = _floor_sub(tgv_wall_big, tgv_floor)
        tgv_rate_dev = (64 * 128 * 128 * tgv_iters / tgv_device / 1e9
                        if tgv_device else None)

        out.update({
            "tgv_learn_walltime_s": round(tgv_wall, 4),
            "tgv_learned_alpha": [round(float(a), 6) for a in res_tgv.x],
            "tgv_final_cost": round(float(res_tgv.cost), 4),
            "tgv_psnr_db": round(tgv_psnr, 3),
            "tgv_fused_walltime_s": (
                round(tgv_fused_wall, 4)
                if tgv_fused_wall is not None else None),
            "tgv_fused_alpha": (
                [round(float(a), 6) for a in np.asarray(res_tgvf.x)]
                if res_tgvf is not None else None),
            "tgv_fused_final_cost": (
                round(float(res_tgvf.cost), 4)
                if res_tgvf is not None else None),
            "tgv_patch_fused_walltime_s": (
                round(tgv_patch_wall, 4)
                if tgv_patch_wall is not None else None),
            "tgv_tiled_1024_walltime_s": (
                round(tgv_tiled_1024_wall, 4)
                if tgv_tiled_1024_wall is not None else None),
            "tgv_one_kernel_walltime_s": (
                round(tgv_ok_wall, 4) if tgv_ok_wall is not None else None),
            "tgv_gpix_iter_per_sec_batch64": round(
                64 * 128 * 128 * tgv_iters / tgv_wall_big / 1e9, 2),
            "tgv_gpix_iter_per_sec_batch64_device": (
                round(tgv_rate_dev, 2) if tgv_rate_dev else None),
        })
        if only == "tgv":
            out["value"] = _sweep_score(tgv_device or tgv_wall_big, out, (
                "tgv_fused_walltime_s", "tgv_patch_fused_walltime_s",
                "tgv_one_kernel_walltime_s"))
            return out

    # --- vectorial (color) TV (beyond-reference model family) --------------
    # NOTE: this section sits BELOW every pinned kernel call site above, so
    # adding it did not shift their source lines (the compile-cache key is
    # line-sensitive; BASELINE.md "Per-kernel-family salts").
    if only in (None, "vtv"):
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.data import testdataset
        from bpldenoising_tpu.learning import make_vtv_learning_function
        from bpldenoising_tpu.metrics import psnr

        ct, cd = testdataset("color_disks_128_10", color=True)
        cds = (jnp.asarray(ct, ds[0].dtype), jnp.asarray(cd, ds[0].dtype))

        # bilevel learn: host TR, each evaluation one dispatch (coupled
        # fused-kernel solve + implicit-CG vjp in a single jit)
        vtv_lf = make_vtv_learning_function(maxiter=inner, backend=backend)
        vtv_params = _params(outer) | dict(delta0=0.02)

        def run_vtv():
            res = bilevel_learn(cds, vtv_lf, xinit=np.asarray(0.05),
                                params=vtv_params)
            _sync(res.u)
            return res

        res_vtv = vtv_wall = None
        try:
            res_vtv, vtv_wall = _best_of(run_vtv)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"vtv_learn failed: {e}", file=sys.stderr)

        # fused one-dispatch trust region (same semantics, warm-started
        # early-stopped inner solves chained in the while-loop carry)
        vtv_fused_wall = res_vtvf = None
        try:
            from bpldenoising_tpu.bilevel import bilevel_learn_vtv_fused

            # inner budget 1e-5/100 (round-5 sweep): 1.9× faster than the
            # round-4 1e-6/500 at Δα = 3e-6 and cost +0.005%
            def run_vtv_fused():
                res = bilevel_learn_vtv_fused(
                    cds, xinit=np.asarray(0.05), params=vtv_params,
                    inner_maxiter=inner, inner_tol=1e-5, check_every=100,
                    backend=backend)
                _sync(res.u)
                return res

            res_vtvf, vtv_fused_wall = _best_of(run_vtv_fused)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"vtv_fused failed: {e}", file=sys.stderr)

        # raw channel-coupled kernel throughput (floor-subtracted device
        # rate; batch-64 RGB = 192 image planes of state, ~3× TV batch-64)
        vtv_rate_dev = None
        try:
            vtv_big = jnp.tile(cds[1], (11, 1, 1, 1))[:64]
            vtv_iters = 200 if quick else 2000
            if backend == "pallas":
                from bpldenoising_tpu.solvers.vtv_pallas import \
                    vtv_denoise_pdps_pallas
                run_vtv_big = lambda: vtv_denoise_pdps_pallas(
                    vtv_big, 0.1, maxiter=vtv_iters)
            else:
                from bpldenoising_tpu.solvers.pdps import vtv_denoise
                run_vtv_big = lambda: vtv_denoise(
                    vtv_big, 0.1, maxiter=vtv_iters)
            _sync(run_vtv_big())
            vtv_wall_big = vtv_floor = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(trivial(cds[1]))
                vtv_floor = min(vtv_floor, time.perf_counter() - t0)
                t0 = time.perf_counter()
                _sync(run_vtv_big())
                vtv_wall_big = min(vtv_wall_big,
                                   time.perf_counter() - t0)
            vtv_device = _floor_sub(vtv_wall_big, vtv_floor)
            # pixel-iterations count channels (3 coupled planes per image)
            vtv_rate_dev = (64 * 3 * 128 * 128 * vtv_iters / vtv_device
                            / 1e9 if vtv_device else None)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"vtv_throughput failed: {e}", file=sys.stderr)

        if res_vtv is not None:
            vtv_psnr = float(np.mean(np.asarray(psnr(cds[0], res_vtv.u))))
            out.update({
                "vtv_learn_walltime_s": round(vtv_wall, 4),
                "vtv_learned_alpha": round(float(res_vtv.x), 6),
                "vtv_final_cost": round(float(res_vtv.cost), 4),
                "vtv_psnr_db": round(vtv_psnr, 3),
            })
        if res_vtvf is not None:
            out.update({
                "vtv_fused_walltime_s": round(vtv_fused_wall, 4),
                "vtv_fused_alpha": round(float(res_vtvf.x), 6),
                "vtv_fused_final_cost": round(float(res_vtvf.cost), 4),
            })
        if vtv_rate_dev is not None:
            out["vtv_gpix_iter_per_sec_batch64"] = round(
                64 * 3 * 128 * 128 * vtv_iters / vtv_wall_big / 1e9, 2)
            out["vtv_gpix_iter_per_sec_batch64_device"] = round(
                vtv_rate_dev, 2)

        # single-loop first-order learner (one lax.scan dispatch; appended
        # BELOW every earlier call site — see the line-sensitivity NOTE)
        try:
            from bpldenoising_tpu.bilevel import single_loop_vtv_learn

            def run_vtv_sl():
                res = single_loop_vtv_learn(cds[0], cds[1], 0.05,
                                            outer=300, n_inner=40, n_adj=10)
                _sync(res.u)
                return res

            r_vsl, vtv_sl_wall = _best_of(run_vtv_sl)
            out.update({
                "vtv_single_loop_walltime_s": round(vtv_sl_wall, 4),
                "vtv_single_loop_alpha": round(float(r_vsl.alpha), 6),
                "vtv_single_loop_final_cost": round(float(r_vsl.cost), 4),
            })
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"vtv_single_loop failed: {e}", file=sys.stderr)

        # one-kernel learner (single color image, fully VMEM-resident)
        try:
            from bpldenoising_tpu.bilevel import single_loop_vtv_pallas

            def run_vtv_ok():
                a, u, _ = single_loop_vtv_pallas(cds[0][0], cds[1][0], 0.05,
                                                 outer=300, n_inner=40,
                                                 n_adj=10)
                _sync(u)
                return a

            a_vok, vtv_ok_wall = _best_of(run_vtv_ok)
            out.update({
                "vtv_one_kernel_walltime_s": round(vtv_ok_wall, 4),
                "vtv_one_kernel_alpha": round(float(a_vok), 6),
            })
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"vtv_one_kernel failed: {e}", file=sys.stderr)

        # beyond-VMEM color scaling point: 1024² RGB (~96 MiB of state if
        # resident) routes to the jnp/HBM rung — a tiled color kernel was
        # measured-rejected (BASELINE.md); this guards the routed path
        if not quick and backend == "pallas":
            try:
                from bpldenoising_tpu.solvers.vtv_pallas import \
                    vtv_denoise_pdps_pallas as _vtv_pallas
                big_c = jnp.tile(cds[1][:1], (1, 1, 8, 8))  # (1, 3, 1024, 1024)
                run_vtv_1024 = lambda: _vtv_pallas(big_c, 0.1, maxiter=2000)
                _, vtv_1024_wall = _best_of(run_vtv_1024, n=3)
                out["vtv_1024_walltime_s"] = round(vtv_1024_wall, 4)
            except Exception as e:  # pragma: no cover - hardware-specific
                print(f"vtv_1024 failed: {e}", file=sys.stderr)

        if only == "vtv":
            out["value"] = _sweep_score(vtv_device or vtv_wall_big, out, (
                "vtv_fused_walltime_s", "vtv_one_kernel_walltime_s"))
            return out

    # --- TV-L1 (beyond-reference noise-model family) -----------------------
    # NOTE: sits BELOW every pinned call site above (line-sensitivity NOTE)
    if only in (None, "tvl1"):
        from bpldenoising_tpu.data import testdataset
        from bpldenoising_tpu.metrics import psnr

        spt, spd = testdataset("circle_sp_128_20")
        spt = jnp.asarray(spt, ds[0].dtype)
        spd = jnp.asarray(spd, ds[0].dtype)

        tvl1_device = None
        try:
            if backend == "pallas":
                from bpldenoising_tpu.solvers.tvl1_pallas import \
                    tvl1_denoise_pallas as _tvl1
            else:
                from bpldenoising_tpu.solvers.tvl1 import \
                    tvl1_denoise as _tvl1
            # quality at the sweep-selected weight
            u_sp = _tvl1(spd, 0.9, maxiter=200 if quick else 10000)
            _sync(u_sp)
            out["tvl1_psnr_db"] = round(
                float(np.mean(np.asarray(psnr(spt, u_sp)))), 3)
            # batch-64 device throughput, floor-subtracted
            sp_big = jnp.tile(spd, (64, 1, 1))
            sp_iters = 200 if quick else 2000
            run_tvl1 = lambda: _tvl1(sp_big, 0.9, maxiter=sp_iters)
            _sync(run_tvl1())
            t_wall = t_floor = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(trivial(spd))
                t_floor = min(t_floor, time.perf_counter() - t0)
                t0 = time.perf_counter()
                _sync(run_tvl1())
                t_wall = min(t_wall, time.perf_counter() - t0)
            tvl1_device = _floor_sub(t_wall, t_floor)
            out["tvl1_gpix_iter_per_sec_batch64"] = round(
                64 * 128 * 128 * sp_iters / t_wall / 1e9, 2)
            out["tvl1_gpix_iter_per_sec_batch64_device"] = (
                round(64 * 128 * 128 * sp_iters / tvl1_device / 1e9, 2)
                if tvl1_device else None)

            # bilevel learning of the TV-L1 weight (Huber-smoothed
            # surrogate, host TR loop — learning/tvl1.py)
            from bpldenoising_tpu.bilevel import bilevel_learn
            from bpldenoising_tpu.learning.tvl1 import \
                make_tvl1_learning_function
            sp_ds = (np.asarray(spt), np.asarray(spd))
            lrn_params = _params(3 if quick else 15) | dict(
                delta0=0.1, alpha0=0.4)
            lf = make_tvl1_learning_function(
                maxiter=200 if quick else 2000)
            _ = lf(0.4, sp_ds, 0.1)    # compile outside the timed region
            t0 = time.perf_counter()
            res_tvl1 = bilevel_learn(sp_ds, lf, xinit=0.4,
                                     params=lrn_params)
            _sync(res_tvl1.u)
            out["tvl1_learn_walltime_s"] = round(
                time.perf_counter() - t0, 4)
            out["tvl1_learn_alpha"] = round(float(res_tvl1.x), 5)
            out["tvl1_learn_psnr_db"] = round(
                float(np.mean(np.asarray(psnr(spt, res_tvl1.u)))), 3)

            # fused on-device TR — the method matrix's tr_fused rung
            # (bilevel/fused_tvl1.py; one dispatch for the whole loop)
            from bpldenoising_tpu.bilevel import (bilevel_learn_tvl1_fused,
                                                  single_loop_tvl1_learn)

            def run_tvl1_fused():
                res = bilevel_learn_tvl1_fused(
                    sp_ds, xinit=0.4, params=lrn_params,
                    inner_maxiter=200 if quick else 2000, inner_tol=1e-6,
                    check_every=100, backend=backend)
                _sync(res.u)
                return res

            r_tf, tvl1_fused_wall = _best_of(run_tvl1_fused)
            out["tvl1_fused_walltime_s"] = round(tvl1_fused_wall, 4)
            out["tvl1_fused_alpha"] = round(float(r_tf.x), 5)
            out["tvl1_fused_final_cost"] = round(float(r_tf.cost), 4)

            # single-loop first-order learner (one lax.scan dispatch)
            def run_tvl1_sl():
                res = single_loop_tvl1_learn(spt, spd, 0.4, outer=300,
                                             n_inner=40, n_adj=10)
                _sync(res.u)
                return res

            r_tsl, tvl1_sl_wall = _best_of(run_tvl1_sl)
            out["tvl1_single_loop_walltime_s"] = round(tvl1_sl_wall, 4)
            out["tvl1_single_loop_alpha"] = round(float(r_tsl.alpha), 5)
            out["tvl1_single_loop_final_cost"] = round(
                float(r_tsl.cost), 4)

            # one-kernel learner (single image, fully VMEM-resident)
            from bpldenoising_tpu.bilevel import single_loop_tvl1_pallas

            def run_tvl1_ok():
                a, u, _ = single_loop_tvl1_pallas(spt[0], spd[0], 0.4,
                                                  outer=300, n_inner=40,
                                                  n_adj=10)
                _sync(u)
                return a

            a_l1ok, tvl1_ok_wall = _best_of(run_tvl1_ok)
            out["tvl1_one_kernel_walltime_s"] = round(tvl1_ok_wall, 4)
            out["tvl1_one_kernel_alpha"] = round(float(a_l1ok), 5)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"tvl1 failed: {e}", file=sys.stderr)
        if only == "tvl1":
            out["value"] = _sweep_score(tvl1_device, out, (
                "tvl1_fused_walltime_s", "tvl1_one_kernel_walltime_s"))
            return out

    # --- fine-grid spatially-varying α (the L-BFGS trust-region tier) ------
    # 16×16 patch grid (256 params > lbfgs_threshold) on the flagship faces
    # stack, initialized at the learned scalar α: the run must BEAT the
    # scalar PSNR to count (scripts/fine_grid.py runs the full ladder)
    if only in (None, "fine_grid"):
        try:
            fg_outer = 4 if quick else 16
            fg_inner = 200 if quick else 2000
            a_star = float(out.get("learned_alpha") or FLAGSHIP_ALPHA)
            x0g = jnp.full((16, 16), jnp.asarray(a_star, ds[0].dtype))

            def run_fg():
                res = bilevel_learn_fused(
                    ds, xinit=x0g,
                    params=_params(fg_outer) | dict(delta0=a_star / 4),
                    inner_maxiter=fg_inner, inner_tol=1e-6,
                    check_every=100, backend=backend)
                _sync(res.u)
                return res

            r_fg, fg_wall = _best_of(run_fg)
            fg_psnr = float(np.mean(np.asarray(psnr(ds[0], r_fg.u))))
            out["fine_grid16_walltime_s"] = round(fg_wall, 4)
            out["fine_grid16_psnr_db"] = round(fg_psnr, 3)
            out["fine_grid16_final_cost"] = round(float(r_fg.cost), 4)
            if out.get("mean_psnr_db"):
                out["fine_grid16_psnr_gain_db"] = round(
                    fg_psnr - out["mean_psnr_db"], 3)

            if not quick:
                # 32×32 = 1024-param grid (VERDICT r4 #6): the stronger
                # fine-grid result (+0.139 dB over the learned scalar in
                # scripts/fine_grid_pallas.json) gets a per-round guard.
                # Needs the larger outer budget the ladder script uses
                # (~57 TR iterations to converge at 1024 params).
                x0g32 = jnp.full((32, 32), jnp.asarray(a_star, ds[0].dtype))

                def run_fg32():
                    res = bilevel_learn_fused(
                        ds, xinit=x0g32,
                        params=_params(60) | dict(delta0=a_star / 4),
                        inner_maxiter=fg_inner, inner_tol=1e-6,
                        check_every=100, backend=backend)
                    _sync(res.u)
                    return res

                r32, fg32_wall = _best_of(run_fg32)
                fg32_psnr = float(np.mean(np.asarray(psnr(ds[0], r32.u))))
                out["fine_grid32_walltime_s"] = round(fg32_wall, 4)
                out["fine_grid32_psnr_db"] = round(fg32_psnr, 3)
                out["fine_grid32_final_cost"] = round(float(r32.cost), 4)
                if out.get("mean_psnr_db"):
                    out["fine_grid32_psnr_gain_db"] = round(
                        fg32_psnr - out["mean_psnr_db"], 3)

                # pixelwise 128×128 = 16,384-param full-resolution α
                # (VERDICT r4 #3 capstone): the parameterization axis at
                # its natural limit (ref src/TVLearningFunctionVec.jl:57-70
                # caps the PatchOp grid only at the image size).  Warm-
                # started from the learned 32×32 map (block-upsampled), so
                # it must BEAT the 32×32 optimum to show a gain here.
                from bpldenoising_tpu.ops import PatchOp
                x0px = PatchOp((32, 32), (128, 128)).apply(r32.x)

                def run_px():
                    res = bilevel_learn_fused(
                        ds, xinit=x0px,
                        params=_params(100) | dict(delta0=a_star / 8),
                        inner_maxiter=fg_inner, inner_tol=1e-6,
                        check_every=100, backend=backend)
                    _sync(res.u)
                    return res

                rpx, px_wall = _best_of(run_px)
                px_psnr = float(np.mean(np.asarray(psnr(ds[0], rpx.u))))
                out["pixelwise128_walltime_s"] = round(px_wall, 4)
                out["pixelwise128_psnr_db"] = round(px_psnr, 3)
                out["pixelwise128_final_cost"] = round(float(rpx.cost), 4)
                out["pixelwise128_psnr_vs_grid32_db"] = round(
                    px_psnr - fg32_psnr, 3)
                if out.get("mean_psnr_db"):
                    out["pixelwise128_psnr_gain_db"] = round(
                        px_psnr - out["mean_psnr_db"], 3)
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"fine_grid failed: {e}", file=sys.stderr)

        # fine-grid TGV on pyramid (VERDICT r4 #6): 16×16×2 = 512 params
        # initialized at the learned scalar [α₁, α₀]; gain vs the scalar
        # TGV optimum on the same dataset (scripts/fine_grid.py:137-165,
        # where it measured +1.1 dB).  Skipped in quick mode.
        if not quick:
            try:
                import bpldenoising_tpu.experiments as ex
                from bpldenoising_tpu.data import testdataset
                common = dict(method="tr_fused", backend=backend,
                              dtype=dtype_name, inner_maxiter=inner,
                              save_results=False, verbose_iter=0)
                res_ts = ex.scalar_bilevel_tgv_learn(
                    dataset_name="pyramid_128_10", num_samples=1,
                    maxiter=20, **common)
                a_tgv = np.asarray(res_ts.x)
                true_p, _ = testdataset("pyramid_128_10")

                def _pyr_psnr(u):
                    u = np.asarray(u).reshape(-1, 128, 128)
                    t = jnp.asarray(true_p[: u.shape[0]], ds[0].dtype)
                    return float(np.mean(np.asarray(psnr(t,
                                                         jnp.asarray(u)))))

                tgv_scalar_psnr = _pyr_psnr(res_ts.u)
                x0t = np.ones((16, 16, 2)) * a_tgv[None, None, :]
                t0 = time.perf_counter()
                res_tg = ex.patch_bilevel_tgv_learn(
                    dataset_name="pyramid_128_10", num_samples=1,
                    alpha0=x0t, delta0=float(a_tgv.min()) / 4.0,
                    maxiter=60, **common)
                _sync(res_tg.u)
                tgv_fg_wall = time.perf_counter() - t0
                tgv_fg_psnr = _pyr_psnr(res_tg.u)
                out["fine_grid_tgv_walltime_s"] = round(tgv_fg_wall, 4)
                out["fine_grid_tgv_psnr_db"] = round(tgv_fg_psnr, 3)
                out["fine_grid_tgv_psnr_gain_db"] = round(
                    tgv_fg_psnr - tgv_scalar_psnr, 3)
            except Exception as e:  # pragma: no cover - hardware-specific
                print(f"fine_grid_tgv failed: {e}", file=sys.stderr)

        if only == "fine_grid":
            out["value"] = out.get("fine_grid16_walltime_s", 0.0)
            return out

    return out


def measure_baseline() -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from bpldenoising_tpu.bilevel import bilevel_learn
    from bpldenoising_tpu.learning import make_tv_learning_function
    ds = _dataset("float64")
    params = _params(20)
    lf = make_tv_learning_function(maxiter=5000, backend="jnp")
    u, c, g = lf(0.1, ds, 0.1)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    bilevel_learn(ds, lf, xinit=0.1, params=params)
    wall = time.perf_counter() - t0
    print(f"CPU_BASELINE_SECONDS = {wall:.2f}", file=sys.stderr)
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backend", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--only", default=None,
                    choices=["flagship", "one_kernel", "throughput", "fine_grid", "tgv",
                             "vtv", "tvl1"],
                    help="measure only one kernel family's section "
                         "(used by scripts/pin_schedule.py)")
    ap.add_argument("--flagship-only", action="store_true",
                    help="alias for --only flagship")
    args = ap.parse_args()
    if args.measure_baseline:
        measure_baseline()
        return
    only = args.only or ("flagship" if args.flagship_only else None)
    try:
        result = run(quick=args.quick, backend=args.backend,
                     dtype_name=args.dtype, only=only)
    except RuntimeError as e:
        if "nable to initialize backend" not in str(e):
            raise
        # the tunneled TPU can be hard-down for hours (axon backend
        # UNAVAILABLE); emit a diagnostic artifact instead of nothing so
        # the round record shows WHY there is no measurement
        result = {"metric": "bilevel learn walltime, faces_train_128_10",
                  "value": None, "unit": "s", "vs_baseline": None,
                  "error": f"TPU backend unavailable: {e}"}
    _emit(result)


# Ordered whitelist for the compact stdout line (VERDICT r4 #2): the
# driver records only the last ~2000 chars of stdout, and the full result
# dict outgrew that in round 4 (BENCH_r04.json parsed: null).  The full
# dict now goes to a committed file; stdout gets the headline + the
# per-family walltimes + the regression-guard fields, hard-capped below
# the driver's tail window.  Later keys are dropped first if the cap is
# ever hit, so metric/value/vs_baseline always survive.
_COMPACT_KEYS = (
    "metric", "value", "unit", "vs_baseline", "vs_baseline_r1",
    "value_raw_s", "learned_alpha", "alpha_vs_parity_target",
    "mean_psnr_db", "final_cost", "outer_iterations",
    "flagship_adjoint_cg_max_iters", "flagship_adjoint_cg_all_converged",
    "adjoint_cg_iters", "adjoint_cg_converged",
    "warning_flagship_cg_capped", "warning_accuracy_cg_unconverged",
    "error", "quick", "only",
    "tr_host_walltime_s", "tr_parity_walltime_s",
    "single_loop_walltime_s", "one_kernel_walltime_s",
    "sumregs_walltime_s", "patch_tv_walltime_s",
    "gpix_iter_per_sec_batch256_128_device", "vpu_util_pct_batch256",
    "tgv_learn_walltime_s", "tgv_fused_walltime_s",
    "tgv_one_kernel_walltime_s", "tgv_gpix_iter_per_sec_batch64_device",
    "vtv_learn_walltime_s", "vtv_fused_walltime_s",
    "vtv_single_loop_walltime_s", "vtv_one_kernel_walltime_s",
    "tvl1_learn_walltime_s", "tvl1_fused_walltime_s",
    "tvl1_single_loop_walltime_s", "tvl1_one_kernel_walltime_s",
    "fine_grid16_psnr_gain_db", "fine_grid32_psnr_gain_db",
    "fine_grid_tgv_psnr_gain_db", "pixelwise128_psnr_gain_db",
    "pixelwise128_walltime_s",
)

_COMPACT_MAX_CHARS = 1500


def _emit(result: dict) -> None:
    """Write the full result to bench_results/ and print a compact line.

    The full record is the durable machine-readable artifact (committed;
    ``bench_results/latest.json`` is a stable alias).  The stdout line is
    what the round driver captures; it carries the whitelisted headline
    fields plus a ``full_results`` pointer and never exceeds
    ``_COMPACT_MAX_CHARS``.
    """
    import datetime
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "bench_results")
    path = None
    try:
        os.makedirs(outdir, exist_ok=True)
        ts = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ")
        path = os.path.join(outdir, f"BENCH_{ts}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        with open(os.path.join(outdir, "latest.json"), "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    except OSError as e:  # read-only checkout: stdout line still works
        print(f"bench_results write failed: {e}", file=sys.stderr)
        path = None

    compact = {k: result[k] for k in _COMPACT_KEYS[:4] if k in result}
    if path is not None:
        compact["full_results"] = os.path.relpath(path, here)
    for k in _COMPACT_KEYS[4:]:
        if k in result:
            # warnings carry prose in the full record; the compact line
            # only needs the flag
            compact[k] = True if k.startswith("warning") else result[k]
    line = json.dumps(compact)
    while len(line) > _COMPACT_MAX_CHARS and len(compact) > 5:
        compact.pop(next(reversed(compact)))
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
