"""Fine-grid spatially-varying α at full scale (VERDICT r3 #2).

The reference's patch machinery defaults to 2×2 grids
(``src/BPLDenoising.jl:350-357``) and that is all earlier rounds ever ran
end-to-end; this script exercises the framework's *claimed* large-grid
capability (``bilevel/trust_region.py`` / ``bilevel/tr_core.py``: L-BFGS
model above ``lbfgs_threshold=64`` parameters) at 128² with 256 / 1024 /
512 parameters:

* 16×16 and 32×32 patch-TV learning on cameraman_128_10 (1 image) and
  faces_train_128_10 (10 images), ``method='tr_fused'`` — the whole TR
  loop incl. the two-loop-recursion L-BFGS dogleg is one device program;
* one 16×16×2 patch-TGV run on pyramid;
* each fine grid is initialized at the *learned scalar* α of the same
  dataset (uniform map), with Δ₀ scaled to the parameter floor, so the
  fine grid must BEAT the scalar optimum to count — the headline check is
  mean PSNR(fine grid) ≥ PSNR(learned scalar).

Writes one JSON (scripts/fine_grid_<backend>.json) with walltimes,
learned-parameter stats, final costs and PSNRs; FIDELITY.md / BASELINE.md
/ REPRODUCTION.md cite it.

Usage:
    python scripts/fine_grid.py                 # TPU (pallas backend)
    python scripts/fine_grid.py --cpu           # CPU float64 oracle
    python scripts/fine_grid.py --quick         # tiny budgets (smoke)
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
                    help="outer TR iterations for the fine grids")
    ap.add_argument("--inner-maxiter", type=int, default=None)
    ap.add_argument("--skip-tgv", action="store_true")
    ap.add_argument("--grids", default="16,32",
                    help="comma-separated square grid sizes")
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

    inner = args.inner_maxiter or (500 if args.quick else 5000)
    outer_scalar = 5 if args.quick else 20
    # fine grids get a larger outer budget: 256–1024 parameters need more
    # curvature pairs than the reference's 20-iteration default (tuned so
    # the 16×16 run converges to Δ < tol or a flat valley)
    outer_fine = args.maxiter or (6 if args.quick else 60)
    grids = [int(g) for g in args.grids.split(",") if g]

    out = {
        "dtype": dtype, "backend": backend, "quick": bool(args.quick),
        "inner_maxiter": inner, "outer_fine": outer_fine,
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

    for ds_name, nsamp in (("cameraman_128_10", 1),
                           ("faces_train_128_10", 10)):
        tag = ds_name.split("_")[0]
        t0 = time.perf_counter()
        res_s = ex.scalar_bilevel_tv_learn(
            dataset_name=ds_name, num_samples=nsamp,
            maxiter=outer_scalar, **common)
        np.asarray(res_s.u)
        out[f"{tag}_scalar_walltime_s"] = round(time.perf_counter() - t0, 3)
        alpha_s = float(np.asarray(res_s.x))
        out[f"{tag}_scalar_alpha"] = round(alpha_s, 6)
        out[f"{tag}_scalar_cost"] = round(float(res_s.cost), 5)
        out[f"{tag}_scalar_psnr"] = round(mean_psnr(ds_name, res_s.u), 4)
        print(f"[{tag}] scalar: alpha={alpha_s:.5f} "
              f"cost={res_s.cost:.4f} psnr={out[f'{tag}_scalar_psnr']:.3f} "
              f"({out[f'{tag}_scalar_walltime_s']}s)", flush=True)

        for g in grids:
            key = f"{tag}_patch{g}x{g}"
            t0 = time.perf_counter()
            res_g = ex.patch_bilevel_tv_learn(
                dataset_name=ds_name, num_samples=nsamp,
                alpha0=alpha_s * np.ones((g, g)),
                delta0=alpha_s / 4.0, maxiter=outer_fine, **common)
            np.asarray(res_g.u)
            wall = time.perf_counter() - t0
            xg = np.asarray(res_g.x)
            out[f"{key}_walltime_s"] = round(wall, 3)
            out[f"{key}_n_params"] = int(xg.size)
            out[f"{key}_alpha_min"] = round(float(xg.min()), 6)
            out[f"{key}_alpha_max"] = round(float(xg.max()), 6)
            out[f"{key}_alpha_mean"] = round(float(xg.mean()), 6)
            out[f"{key}_cost"] = round(float(res_g.cost), 5)
            out[f"{key}_psnr"] = round(mean_psnr(ds_name, res_g.u), 4)
            out[f"{key}_iterations"] = int(res_g.iterations)
            out[f"{key}_beats_scalar_cost"] = bool(
                res_g.cost <= res_s.cost + 1e-9)
            out[f"{key}_beats_scalar_psnr"] = bool(
                out[f"{key}_psnr"] >= out[f"{tag}_scalar_psnr"] - 1e-6)
            print(f"[{tag}] {g}x{g}: cost={res_g.cost:.4f} "
                  f"psnr={out[f'{key}_psnr']:.3f} "
                  f"alpha∈[{xg.min():.4f},{xg.max():.4f}] "
                  f"iters={res_g.iterations} ({wall:.1f}s)", flush=True)

    if not args.skip_tgv:
        # one fine-grid TGV run: 16×16×2 = 512 parameters on pyramid
        g = 16
        t0 = time.perf_counter()
        res_ts = ex.scalar_bilevel_tgv_learn(
            dataset_name="pyramid_128_10", num_samples=1,
            maxiter=outer_scalar, **common)
        np.asarray(res_ts.u)
        a = np.asarray(res_ts.x)      # learned [α₁, α₀]
        out["tgv_scalar_alpha"] = [round(float(v), 6) for v in a]
        out["tgv_scalar_cost"] = round(float(res_ts.cost), 5)
        out["tgv_scalar_psnr"] = round(
            mean_psnr("pyramid_128_10", res_ts.u), 4)
        x0 = np.ones((g, g, 2)) * a[None, None, :]
        t0 = time.perf_counter()
        res_tg = ex.patch_bilevel_tgv_learn(
            dataset_name="pyramid_128_10", num_samples=1, alpha0=x0,
            delta0=float(a.min()) / 4.0, maxiter=outer_fine, **common)
        np.asarray(res_tg.u)
        wall = time.perf_counter() - t0
        xg = np.asarray(res_tg.x)
        out["tgv_patch16x16_walltime_s"] = round(wall, 3)
        out["tgv_patch16x16_n_params"] = int(xg.size)
        out["tgv_patch16x16_cost"] = round(float(res_tg.cost), 5)
        out["tgv_patch16x16_psnr"] = round(
            mean_psnr("pyramid_128_10", res_tg.u), 4)
        out["tgv_patch16x16_beats_scalar_psnr"] = bool(
            out["tgv_patch16x16_psnr"] >= out["tgv_scalar_psnr"] - 1e-6)
        print(f"[tgv] 16x16x2: cost={res_tg.cost:.4f} "
              f"psnr={out['tgv_patch16x16_psnr']:.3f} ({wall:.1f}s)",
              flush=True)

    path = os.path.join(os.path.dirname(__file__),
                        f"fine_grid_{'cpu' if args.cpu else backend}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
