#!/usr/bin/env python
"""Fidelity matrix: run every experiment family on (a) CPU float64 — the
reference-equivalent oracle — and (b) the requested backend/dtype (TPU
float32 + fused Pallas kernel by default), and report learned parameters,
final cost and PSNR side by side.

Writes JSON to scripts/fidelity_<mode>.json; scripts/make_fidelity_report.py
merges the two into FIDELITY.md.

Usage:
    JAX_PLATFORMS=cpu python scripts/fidelity_matrix.py --mode oracle
    python scripts/fidelity_matrix.py --mode tpu
    python scripts/fidelity_matrix.py --mode tpu --only tgv   # re-run rows
        whose key contains 'tgv', merged into the existing JSON (for
        re-measuring one row without paying the whole matrix)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_matrix(mode: str, only: str | None = None) -> dict:
    import jax

    if mode == "oracle":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
        backend = "jnp"
    else:
        dtype = "float32"
        backend = "pallas"

    import jax.numpy as jnp
    import numpy as np
    from bpldenoising_tpu.bilevel import bilevel_learn
    from bpldenoising_tpu.data import testdataset
    from bpldenoising_tpu.learning import (
        make_sumregs_learning_function,
        make_tv_learning_function,
    )
    from bpldenoising_tpu.metrics import psnr
    from bpldenoising_tpu.utils.config import Params

    float(jnp.zeros(()))  # warm the device↔host path

    def tr_params(delta0, maxiter=20):
        return Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                      delta0=delta0, maxiter=maxiter, tol=1e-5,
                      verbose_iter=0)

    def load(name, n):
        t, d = testdataset(name)
        dt = jnp.dtype(dtype)
        return jnp.asarray(t[:n], dt), jnp.asarray(d[:n], dt)

    results = {}

    def warm(lf, x0, ds):
        """Compile both gradient branches (cold and warm-started CG jit
        variants) for this parameter shape before timing (the reference's
        harness likewise excludes JIT time, src/BilevelVisualise.jl:192-196)."""
        for delta in (0.1, 0.1, 1e-12, 1e-12):
            u, _, _ = lf(x0, ds, delta)
            jax.block_until_ready(u)

    def record(key, ds, res, wall):
        results[key] = dict(
            x=np.asarray(res.x).tolist(),
            cost=float(res.cost),
            g_norm=float(res.g_norm),
            iterations=int(res.iterations),
            mean_psnr=float(np.mean(np.asarray(
                psnr(ds[0], jnp.asarray(res.u))))),
            wall_s=round(wall, 3),
        )
        print(f"{key}: {results[key]}", file=sys.stderr)

    def want(key):
        return only is None or only in key

    # 1. scalar TV on faces (the flagship)
    if want("scalar_tv_faces10"):
        ds = load("faces_train_128_10", 10)
        lf = make_tv_learning_function(maxiter=5000, backend=backend)
        warm(lf, 0.1, ds)
        t0 = time.perf_counter()
        res = bilevel_learn(ds, lf, xinit=0.1, params=tr_params(0.1))
        record("scalar_tv_faces10", ds, res, time.perf_counter() - t0)

    # 2. patch 2x2 TV on cameraman (ref patch_bilevel_params: Δ₀=α₀=1e-4)
    if want("patch2x2_tv_cameraman"):
        ds = load("cameraman_128_5", 1)
        lf = make_tv_learning_function(maxiter=5000, backend=backend)
        warm(lf, 1e-4 * np.ones((2, 2)), ds)
        t0 = time.perf_counter()
        res = bilevel_learn(ds, lf, xinit=1e-4 * np.ones((2, 2)),
                            params=tr_params(1e-4))
        record("patch2x2_tv_cameraman", ds, res, time.perf_counter() - t0)

    # 3. sumregs vector on circle (ref sumregs params: Δ₀=0.01, α₀=1e-3)
    if want("sumregs_vec_circle"):
        ds = load("circle_128_10", 1)
        lf3 = make_sumregs_learning_function(maxiter=5000, backend=backend)
        warm(lf3, np.full(3, 1e-3), ds)
        t0 = time.perf_counter()
        res = bilevel_learn(ds, lf3, xinit=np.full(3, 1e-3),
                            params=tr_params(0.01))
        record("sumregs_vec_circle", ds, res, time.perf_counter() - t0)

    # 4. patch 2x2x3 sumregs on cameraman (ref: β₂=1.5, Δ₀=0.1, α₀=1e-3)
    if want("patch_sumregs_cameraman"):
        ds = load("cameraman_128_5", 1)
        lf3 = make_sumregs_learning_function(maxiter=5000, backend=backend)
        warm(lf3, 1e-3 * np.ones((2, 2, 3)), ds)
        p = tr_params(0.1) | dict(beta2=1.5)
        t0 = time.perf_counter()
        res = bilevel_learn(ds, lf3, xinit=1e-3 * np.ones((2, 2, 3)),
                            params=p)
        record("patch_sumregs_cameraman", ds, res, time.perf_counter() - t0)

    # 5. TGV² weight pair on pyramid (the family's home-turf dataset),
    # fused trust region (host TR is bit-identical at inner_tol=None —
    # FIDELITY.md "TGV method agreement")
    if want("tgv_pair_pyramid"):
        from bpldenoising_tpu.bilevel import bilevel_learn_tgv_fused
        ds = load("pyramid_128_10", 1)
        x0 = np.array([0.05, 0.05])
        t0 = time.perf_counter()
        res = bilevel_learn_tgv_fused(
            ds, xinit=x0, params=tr_params(0.02) | dict(maxiter=15),
            inner_maxiter=3000, inner_tol=None, backend=backend)
        record("tgv_pair_pyramid", ds, res, time.perf_counter() - t0)

    # 6. vectorial (color) TV on color_disks (the family's home-turf
    # dataset), fused trust region (host TR is bit-identical at
    # inner_tol=None — tests/test_vtv.py::TestFusedVTV)
    if want("vtv_scalar_color_disks"):
        from bpldenoising_tpu.bilevel import bilevel_learn_vtv_fused
        t, d = testdataset("color_disks_128_10", color=True)
        dt = jnp.dtype(dtype)
        ds = (jnp.asarray(t, dt), jnp.asarray(d, dt))
        t0 = time.perf_counter()
        res = bilevel_learn_vtv_fused(
            ds, xinit=np.asarray(0.05),
            params=tr_params(0.02) | dict(maxiter=15),
            inner_maxiter=3000, inner_tol=None, backend=backend)
        record("vtv_scalar_color_disks", ds, res, time.perf_counter() - t0)

    # 7. TV-L1 scalar on circle_sp (Huber-smoothed surrogate — the
    # learnable route for the L1 data term; learning/tvl1.py.  Host TR;
    # the inner path is the same jnp PD iteration in both modes, so
    # the row isolates pure f32-vs-f64 drift)
    if want("tvl1_scalar_circle_sp"):
        from bpldenoising_tpu.learning.tvl1 import (
            make_tvl1_learning_function)
        ds = load("circle_sp_128_20", 1)
        lf7 = make_tvl1_learning_function(maxiter=5000)
        warm(lf7, 0.4, ds)
        t0 = time.perf_counter()
        res = bilevel_learn(ds, lf7, xinit=0.4,
                            params=tr_params(0.1) | dict(maxiter=15))
        record("tvl1_scalar_circle_sp", ds, res, time.perf_counter() - t0)

    # 8. TV-L1 fused on-device trust region (method matrix parity with
    # every other family — bilevel/fused_tvl1.py; bit-parity with the
    # host loop at inner_tol=None, tests/test_tvl1_methods.py)
    if want("tvl1_fused_circle_sp"):
        from bpldenoising_tpu.bilevel import bilevel_learn_tvl1_fused
        ds = load("circle_sp_128_20", 1)
        t0 = time.perf_counter()
        res = bilevel_learn_tvl1_fused(
            ds, xinit=0.4, params=tr_params(0.1) | dict(maxiter=15),
            inner_maxiter=5000, inner_tol=None, backend=backend)
        record("tvl1_fused_circle_sp", ds, res, time.perf_counter() - t0)

    # 9. TV-L1 single-loop first-order learner (one lax.scan dispatch;
    # lands in the same TR valley — tests/test_tvl1_methods.py)
    if want("tvl1_single_loop_circle_sp"):
        from bpldenoising_tpu.bilevel import single_loop_tvl1_learn
        ds = load("circle_sp_128_20", 1)
        t0 = time.perf_counter()
        sl = single_loop_tvl1_learn(ds[0], ds[1], 0.4, outer=300,
                                    n_inner=40, n_adj=10)
        np.asarray(sl.u)
        wall = time.perf_counter() - t0
        results["tvl1_single_loop_circle_sp"] = dict(
            x=np.asarray(sl.alpha).tolist(), cost=float(sl.cost),
            g_norm=float(np.asarray(sl.gnorm_trajectory)[-1]),
            iterations=300,
            mean_psnr=float(np.mean(np.asarray(
                psnr(ds[0], jnp.asarray(sl.u))))),
            wall_s=round(wall, 3))
        print(f"tvl1_single_loop_circle_sp: "
              f"{results['tvl1_single_loop_circle_sp']}", file=sys.stderr)

    # 10. pixelwise 128×128 TV on cameraman — full-resolution per-pixel α,
    # the parameterization limit (ref src/TVLearningFunctionVec.jl:57-70:
    # the PatchOp grid is capped only by the image size).  Fused L-BFGS
    # trust region (16,384 params ≫ lbfgs_threshold).  ``x`` is stored as
    # the map's [mean, min, max] — the full 16k-entry map would drown the
    # report table; per-pixel hypergradient correctness is pinned by the
    # FD oracle in tests/test_pixelwise.py instead.
    if want("pixelwise_tv_cameraman"):
        from bpldenoising_tpu.bilevel import bilevel_learn_fused
        ds = load("cameraman_128_5", 1)
        x0 = 0.029 * np.ones((128, 128))   # ≈ the learned scalar α
        t0 = time.perf_counter()
        res = bilevel_learn_fused(
            ds, xinit=x0, params=tr_params(0.029 / 8) | dict(maxiter=15),
            inner_maxiter=3000, inner_tol=None, backend=backend)
        wall = time.perf_counter() - t0
        xg = np.asarray(res.x, dtype=float)
        results["pixelwise_tv_cameraman"] = dict(
            x=[float(xg.mean()), float(xg.min()), float(xg.max())],
            cost=float(res.cost),
            g_norm=float(res.g_norm),
            iterations=int(res.iterations),
            mean_psnr=float(np.mean(np.asarray(
                psnr(ds[0], jnp.asarray(res.u))))),
            wall_s=round(wall, 3),
        )
        print(f"pixelwise_tv_cameraman: "
              f"{results['pixelwise_tv_cameraman']}", file=sys.stderr)

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["oracle", "tpu"], required=True)
    ap.add_argument("--only", default=None,
                    help="substring filter on row keys; results merge "
                         "into the existing JSON instead of replacing it")
    args = ap.parse_args()
    results = run_matrix(args.mode, only=args.only)
    out = os.path.join(os.path.dirname(__file__),
                       f"fidelity_{args.mode}.json")
    if args.only and os.path.exists(out):
        with open(out) as fh:
            merged = json.load(fh)
        merged.update(results)
        results = merged
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
