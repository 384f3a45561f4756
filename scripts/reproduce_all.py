#!/usr/bin/env python
"""Run the complete reference experiment suite end-to-end.

Executes every user-facing capability of the reference (SURVEY.md §2a #1)
with reference-default parameters and collects all artifacts under
``output/``: the four bilevel learns, both validations, and the 1-D/2-D
cost-landscape sweeps with plots.  A summary lands in
``output/REPRODUCTION.md``.

    python scripts/reproduce_all.py            # full budgets
    python scripts/reproduce_all.py --quick    # smoke budgets
    python scripts/reproduce_all.py --backend pallas --dtype float32  # TPU
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backend", default="jnp", choices=["jnp", "pallas"])
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--method", default="tr", choices=["tr", "tr_fused"],
                    help="tr_fused runs every learning experiment as one "
                         "on-device loop (much faster; no checkpoints)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (reproduce without "
                         "accelerator hardware; the ambient axon TPU "
                         "plugin otherwise grabs the backend even for "
                         "--backend jnp, and a down tunnel kills the run)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
        if not args.cpu:
            # f64 is the CPU-oracle mode; TPUs lack f64 kernels for parts
            # of the path (e.g. LuDecomposition in the fused TR's dense
            # model solve), so route the whole run to CPU.  TPU runs use
            # --dtype float32 --backend pallas.
            print("dtype=float64 -> forcing the CPU platform (oracle "
                  "mode); use --dtype float32 for TPU", file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")

    import bpldenoising_tpu.experiments.api as api

    inner = 300 if args.quick else 5000
    sweep_iters = 200 if args.quick else 10000
    outer = 3 if args.quick else 20
    points = 5 if args.quick else 30
    common = dict(inner_maxiter=inner, maxiter=outer, dtype=args.dtype,
                  backend=args.backend, method=args.method,
                  checkpoint=(args.method == "tr"))

    report = [f"# Reproduction run ({'quick' if args.quick else 'full'}, "
              f"backend={args.backend}, dtype={args.dtype}, "
              f"method={args.method})", ""]

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        line = f"- **{name}** — {dt:.1f}s"
        if out is not None and hasattr(out, "x"):
            xr = np.asarray(out.x).ravel()
            if xr.size > 8:   # large maps: stats, not 16k numbers
                xs = (f"{xr.size} params, mean/min/max = "
                      f"[{xr.mean():.6f}, {xr.min():.6f}, {xr.max():.6f}]")
            else:
                xs = str(xr.round(6).tolist())
            line += (f"; x = {xs}, "
                     f"cost = {out.cost:.4f}, iters = {out.iterations}")
        report.append(line)
        print(line, file=sys.stderr)
        return out

    # the four bilevel learns, each on its reference-default dataset
    step("scalar_bilevel_tv_learn (cameraman_128_5)",
         lambda: api.scalar_bilevel_tv_learn(**common))
    step("scalar_bilevel_tv_learn (faces_train, 10 samples)",
         lambda: api.scalar_bilevel_tv_learn(
             dataset_name="faces_train", num_samples=10, **common))
    step("patch_bilevel_tv_learn (2x2)",
         lambda: api.patch_bilevel_tv_learn(**common))
    step("scalar_bilevel_sumregs_learn",
         lambda: api.scalar_bilevel_sumregs_learn(**common))
    step("patch_bilevel_sumregs_learn (2x2x3)",
         lambda: api.patch_bilevel_sumregs_learn(**common))

    # beyond-reference TGV² family
    from bpldenoising_tpu import experiments as ex
    tgv_common = dict(inner_maxiter=inner, maxiter=outer, dtype=args.dtype,
                      backend=args.backend)
    step("scalar_bilevel_tgv_learn (cameraman_128_5)",
         lambda: ex.scalar_bilevel_tgv_learn(**tgv_common))
    step("scalar_bilevel_tgv_learn method=tr_fused",
         lambda: ex.scalar_bilevel_tgv_learn(method="tr_fused",
                                             **tgv_common))
    step("scalar_bilevel_tgv_learn method=single_loop",
         lambda: ex.scalar_bilevel_tgv_learn(
             method="single_loop", sl_outer=max(20, outer * 5),
             **{k: v for k, v in tgv_common.items()
                if k != "inner_maxiter"}))
    step("patch_bilevel_tgv_learn (2x2x2)",
         lambda: ex.patch_bilevel_tgv_learn(**tgv_common))
    step("validate_tgv_parameter",
         lambda: ex.validate_tgv_parameter(
             np.array([0.08, 0.16]), dataset_name="cameraman_128_5",
             inner_maxiter=sweep_iters, dtype=args.dtype))
    step("generate_tgv_cost + plot (circle)",
         lambda: (ex.generate_tgv_cost(
             "circle", np.logspace(-2, -0.5, max(3, points // 2)),
             np.logspace(-2, -0.5, max(3, points // 2)),
             maxiter=sweep_iters, dtype=args.dtype),
             ex.generate_tgv_cost_plot("circle"))[-1])

    # beyond-reference vectorial (color) TV family
    vtv_common = dict(inner_maxiter=inner, maxiter=outer, dtype=args.dtype,
                      backend=args.backend)
    step("scalar_bilevel_vtv_learn (color_disks)",
         lambda: ex.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                             **vtv_common))
    step("scalar_bilevel_vtv_learn method=tr_fused",
         lambda: ex.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                             method="tr_fused",
                                             **vtv_common))
    step("scalar_bilevel_vtv_learn method=single_loop",
         lambda: ex.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                             method="single_loop",
                                             sl_outer=(20 if args.quick
                                                       else 300),
                                             **vtv_common))
    step("patch_bilevel_vtv_learn (2x2)",
         lambda: ex.patch_bilevel_vtv_learn(dataset_name="color_disks",
                                            **vtv_common))
    step("validate_vtv_parameter",
         lambda: ex.validate_vtv_parameter(
             0.11, dataset_name="color_disks",
             inner_maxiter=sweep_iters, dtype=args.dtype))
    step("generate_vtv_cost + plot (color_disks)",
         lambda: (ex.generate_vtv_cost(
             "color_disks", np.logspace(-2.5, -0.3, points),
             maxiter=sweep_iters, dtype=args.dtype),
             ex.generate_vtv_cost_plot("color_disks"))[-1])

    # beyond-reference TV-L1 family (impulse noise); bilevel learning runs
    # the Huber-smoothed surrogate's implicit hypergradient with the full
    # method matrix (tr / tr_fused / single_loop — DESIGN.md "TV-L1")
    tvl1_common = dict(inner_maxiter=inner, maxiter=outer, dtype=args.dtype,
                       backend=args.backend)
    step("scalar_bilevel_tvl1_learn (circle_sp)",
         lambda: ex.scalar_bilevel_tvl1_learn(method=args.method,
                                              **tvl1_common))
    step("scalar_bilevel_tvl1_learn method=tr_fused",
         lambda: ex.scalar_bilevel_tvl1_learn(method="tr_fused",
                                              **tvl1_common))
    step("scalar_bilevel_tvl1_learn method=single_loop",
         lambda: ex.scalar_bilevel_tvl1_learn(
             method="single_loop", sl_outer=(20 if args.quick else 300),
             **{k: v for k, v in tvl1_common.items()
                if k != "inner_maxiter"}))
    step("patch_bilevel_tvl1_learn (2x2)",
         lambda: ex.patch_bilevel_tvl1_learn(
             alpha0=0.4 * np.ones((2, 2)), **tvl1_common))
    step("validate_tvl1_parameter (0.9 on circle_sp)",
         lambda: ex.validate_tvl1_parameter(
             0.9, dataset_name="circle_sp",
             inner_maxiter=sweep_iters, dtype=args.dtype))
    step("generate_tvl1_cost + plot (circle_sp)",
         lambda: (ex.generate_tvl1_cost(
             "circle_sp", np.logspace(-1.0, 1.7, points),
             maxiter=sweep_iters, dtype=args.dtype),
             ex.generate_tvl1_cost_plot("circle_sp"))[-1])

    # fine-grid spatially-varying α through the L-BFGS trust-region path
    # (256 parameters > lbfgs_threshold; scripts/fine_grid.py runs the full
    # 16x16/32x32 ladder with scalar-initialized grids and PSNR checks)
    step("patch_bilevel_tv_learn (16x16 fine grid, L-BFGS)",
         lambda: api.patch_bilevel_tv_learn(
             alpha0=0.07 * np.ones((16, 16)), delta0=0.07 / 4,
             dataset_name="faces_train", num_samples=10, **common))

    # pixelwise full-resolution α — the parameterization limit (one α per
    # pixel; scripts/pixelwise.py runs the scalar→grid→pixelwise ladder
    # with hierarchical warm starts and PSNR checks).  Fused path always:
    # 16,384 host-TR dispatches per dense-gradient evaluation would be
    # pointless on the tunnel.
    px = 32 if args.quick else 128
    step(f"patch_bilevel_tv_learn ({px}x{px} pixelwise, L-BFGS)",
         lambda: api.patch_bilevel_tv_learn(
             alpha0=0.07 * np.ones((px, px)), delta0=0.07 / 8,
             dataset_name="faces_train", num_samples=10,
             **(common | dict(method="tr_fused", checkpoint=False))))

    # validations at plausible learned parameters
    step("validate_tv_parameter (0.07 on faces_val)",
         lambda: api.validate_tv_parameter(
             0.07, dataset_name="faces_val", dtype=args.dtype))
    step("validate_sumregs_parameter",
         lambda: api.validate_sumregs_parameter(
             np.array([0.02, 0.02, 0.01]), dataset_name="circle",
             dtype=args.dtype))

    # cost landscapes + plots
    step("generate_scalar_tv_cost + plot (cameraman_128_5)",
         lambda: (api.generate_scalar_tv_cost(
             "cameraman_128_5", np.logspace(-3, 0, points),
             maxiter=sweep_iters, dtype=args.dtype),
             api.generate_cost_plot("cameraman_128_5"))[-1])
    step("generate_2d_tv_cost + plot (circle)",
         lambda: (api.generate_2d_tv_cost(
             "circle", np.logspace(-3, -1, max(3, points // 2)),
             np.logspace(-3, -1, max(3, points // 2)),
             maxiter=sweep_iters, dtype=args.dtype),
             api.generate_2d_cost_plot("circle"))[-1])

    # artifact inventory
    report += ["", "## Artifacts"]
    for root, _, files in sorted(os.walk("output")):
        for f in sorted(files):
            report.append(f"- `{os.path.join(root, f)}`")

    os.makedirs("output", exist_ok=True)
    with open("output/REPRODUCTION.md", "w") as fh:
        fh.write("\n".join(report) + "\n")
    print("wrote output/REPRODUCTION.md", file=sys.stderr)


if __name__ == "__main__":
    main()
