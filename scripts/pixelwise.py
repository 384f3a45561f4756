"""Full-resolution pixelwise α learning — the parameterization axis at its
natural limit (VERDICT r4 #3 capstone).

The reference's inner solver takes a full-size per-pixel weight array
(``src/TVLearningFunctionVec.jl:57-70`` builds PatchOp for any grid; nothing
caps it below the image size).  Earlier rounds demonstrated 16×16 / 32×32
grids; this script runs the pixelwise limit — **128×128 = 16,384 TV
parameters** (and one 128×128×2 = 32,768-parameter TGV map) — through the
same ``method='tr_fused'`` L-BFGS trust-region path, on cameraman and the
10-image faces stack.

Hierarchical warm start: each pixelwise run is initialized from the learned
32×32 grid of the same dataset, block-upsampled with ``PatchOp.apply`` (an
identity-cost broadcast).  That ladder — scalar → 32×32 → pixelwise — is
how the pixelwise run is asked to *beat* the 32×32 optimum rather than
merely match the scalar.

Writes scripts/pixelwise_<backend>.json with walltimes, parameter stats,
costs and PSNRs; FIDELITY.md / BASELINE.md cite it.

Usage:
    python scripts/pixelwise.py              # TPU (pallas backend)
    python scripts/pixelwise.py --cpu        # CPU float64 oracle (tiny)
    python scripts/pixelwise.py --quick      # tiny budgets (smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="CPU float64 oracle mode (jnp backend)")
    ap.add_argument("--quick", action="store_true", help="tiny budgets")
    ap.add_argument("--maxiter", type=int, default=None,
                    help="outer TR iterations for the pixelwise stage")
    ap.add_argument("--inner-maxiter", type=int, default=None)
    ap.add_argument("--skip-tgv", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype, backend = "float64", "jnp"
    else:
        dtype, backend = "float32", "pallas"

    import numpy as np

    import bpldenoising_tpu.experiments as ex
    from bpldenoising_tpu.data import testdataset
    from bpldenoising_tpu.metrics.quality import psnr_np
    from bpldenoising_tpu.ops import PatchOp

    inner = args.inner_maxiter or (500 if args.quick else 5000)
    outer_scalar = 5 if args.quick else 20
    outer_grid = 6 if args.quick else 60
    # pixelwise gets the largest outer budget: 16k parameters build the
    # L-BFGS curvature model from scratch at full resolution
    outer_px = args.maxiter or (6 if args.quick else 100)

    out = {
        "dtype": dtype, "backend": backend, "quick": bool(args.quick),
        "inner_maxiter": inner, "outer_pixelwise": outer_px,
        "platform": jax.devices()[0].platform,
    }
    common = dict(method="tr_fused", backend=backend, dtype=dtype,
                  inner_maxiter=inner, save_results=False, verbose_iter=0)

    def mean_psnr(ds_name, u):
        true_, _ = testdataset(ds_name)
        u = np.asarray(u)
        if u.ndim == 2:
            u = u[None]
        t = np.asarray(true_)[: u.shape[0]]
        return float(np.mean([psnr_np(t[i], u[i])
                              for i in range(u.shape[0])]))

    def record(key, res, wall, ds_name):
        xg = np.asarray(res.x)
        out[f"{key}_walltime_s"] = round(wall, 3)
        out[f"{key}_n_params"] = int(xg.size)
        out[f"{key}_alpha_min"] = round(float(xg.min()), 6)
        out[f"{key}_alpha_max"] = round(float(xg.max()), 6)
        out[f"{key}_alpha_mean"] = round(float(xg.mean()), 6)
        out[f"{key}_cost"] = round(float(res.cost), 5)
        out[f"{key}_psnr"] = round(mean_psnr(ds_name, res.u), 4)
        out[f"{key}_iterations"] = int(res.iterations)
        return xg

    for ds_name, nsamp in (("cameraman_128_10", 1),
                           ("faces_train_128_10", 10)):
        tag = ds_name.split("_")[0]

        t0 = time.perf_counter()
        res_s = ex.scalar_bilevel_tv_learn(
            dataset_name=ds_name, num_samples=nsamp,
            maxiter=outer_scalar, **common)
        np.asarray(res_s.u)
        alpha_s = float(np.asarray(res_s.x))
        out[f"{tag}_scalar_alpha"] = round(alpha_s, 6)
        out[f"{tag}_scalar_psnr"] = round(mean_psnr(ds_name, res_s.u), 4)
        out[f"{tag}_scalar_cost"] = round(float(res_s.cost), 5)
        print(f"[{tag}] scalar: alpha={alpha_s:.5f} "
              f"psnr={out[f'{tag}_scalar_psnr']:.3f}", flush=True)

        g = 8 if args.quick else 32
        t0 = time.perf_counter()
        res_g = ex.patch_bilevel_tv_learn(
            dataset_name=ds_name, num_samples=nsamp,
            alpha0=alpha_s * np.ones((g, g)),
            delta0=alpha_s / 4.0, maxiter=outer_grid, **common)
        np.asarray(res_g.u)
        x32 = record(f"{tag}_grid{g}", res_g, time.perf_counter() - t0,
                     ds_name)
        print(f"[{tag}] {g}x{g}: psnr={out[f'{tag}_grid{g}_psnr']:.3f} "
              f"({out[f'{tag}_grid{g}_walltime_s']}s)", flush=True)

        # pixelwise: one α per pixel, warm-started from the learned grid
        px = 32 if args.quick else 128
        x0px = np.asarray(PatchOp((g, g), (px, px)).apply(
            np.asarray(res_g.x)))
        t0 = time.perf_counter()
        res_px = ex.patch_bilevel_tv_learn(
            dataset_name=ds_name, num_samples=nsamp, alpha0=x0px,
            delta0=alpha_s / 8.0, maxiter=outer_px, **common)
        np.asarray(res_px.u)
        record(f"{tag}_pixelwise", res_px, time.perf_counter() - t0,
               ds_name)
        out[f"{tag}_pixelwise_beats_grid_psnr"] = bool(
            out[f"{tag}_pixelwise_psnr"]
            >= out[f"{tag}_grid{g}_psnr"] - 1e-6)
        out[f"{tag}_pixelwise_beats_scalar_psnr"] = bool(
            out[f"{tag}_pixelwise_psnr"]
            >= out[f"{tag}_scalar_psnr"] - 1e-6)
        print(f"[{tag}] pixelwise {px}x{px}: "
              f"psnr={out[f'{tag}_pixelwise_psnr']:.3f} "
              f"cost={out[f'{tag}_pixelwise_cost']:.4f} "
              f"iters={out[f'{tag}_pixelwise_iterations']} "
              f"({out[f'{tag}_pixelwise_walltime_s']}s)", flush=True)

    if not args.skip_tgv:
        # one pixelwise TGV map: 128×128×2 = 32,768 parameters on pyramid,
        # warm-started from the learned scalar pair
        t0 = time.perf_counter()
        res_ts = ex.scalar_bilevel_tgv_learn(
            dataset_name="pyramid_128_10", num_samples=1,
            maxiter=outer_scalar, **common)
        np.asarray(res_ts.u)
        a = np.asarray(res_ts.x)
        out["tgv_scalar_alpha"] = [round(float(v), 6) for v in a]
        out["tgv_scalar_psnr"] = round(
            mean_psnr("pyramid_128_10", res_ts.u), 4)
        px = 32 if args.quick else 128
        x0t = np.ones((px, px, 2)) * a[None, None, :]
        t0 = time.perf_counter()
        res_tp = ex.patch_bilevel_tgv_learn(
            dataset_name="pyramid_128_10", num_samples=1, alpha0=x0t,
            delta0=float(a.min()) / 8.0, maxiter=outer_px, **common)
        np.asarray(res_tp.u)
        record("tgv_pixelwise", res_tp, time.perf_counter() - t0,
               "pyramid_128_10")
        out["tgv_pixelwise_beats_scalar_psnr"] = bool(
            out["tgv_pixelwise_psnr"] >= out["tgv_scalar_psnr"] - 1e-6)
        print(f"[tgv] pixelwise {px}x{px}x2: "
              f"psnr={out['tgv_pixelwise_psnr']:.3f} "
              f"({out['tgv_pixelwise_walltime_s']}s)", flush=True)

    path = os.path.join(os.path.dirname(__file__),
                        f"pixelwise_{'cpu' if args.cpu else backend}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
