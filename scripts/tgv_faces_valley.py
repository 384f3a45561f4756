#!/usr/bin/env python
"""Adjudicate the faces TGV host-TR vs fused-TR weight split.

On ``faces_train_128_10`` (BENCH_r03 protocol) the host trust region
learns (α₁, α₀) ≈ (0.0852, 0.0442) while the fused one-dispatch trust
region — whose warm-started chained inner state gives each evaluation a
deeper effective solve — lands at (0.0930, 0.0433) with a slightly lower
reported cost.  Same protocol as ``scripts/sumregs_faces_valley.py``:
evaluate the float64 upper-level cost J(α) with a high-budget inner solve
at both minimizers and along the segment between them, and print a
FIDELITY.md-ready table.

Run on CPU:  python scripts/tgv_faces_valley.py [--iters 20000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bpldenoising_tpu.data import testdataset
from bpldenoising_tpu.learning.tgv import tgv_learning_function
from bpldenoising_tpu.metrics import psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000,
                    help="f64 inner-solve budget per evaluation")
    ap.add_argument("--host", default="0.085244,0.04417",
                    help="host-TR minimizer (BENCH_r03 tgv_learned_alpha)")
    ap.add_argument("--fused", default="0.092952,0.043261",
                    help="fused-TR minimizer (tgv_fused_alpha)")
    ap.add_argument("--points", type=int, default=9)
    args = ap.parse_args()

    x_h = np.asarray([float(v) for v in args.host.split(",")])
    x_f = np.asarray([float(v) for v in args.fused.split(",")])

    t, d = testdataset("faces_train_128_10")
    ds = (jnp.asarray(np.asarray(t), jnp.float64),
          jnp.asarray(np.asarray(d), jnp.float64))

    def J(alpha):
        u, cost, _ = tgv_learning_function(np.asarray(alpha), ds, 0.01,
                                           maxiter=args.iters)
        return float(cost), float(np.mean(np.asarray(psnr(ds[0], u))))

    rows = []
    for tt in np.linspace(0.0, 1.0, args.points):
        a = (1 - tt) * x_h + tt * x_f
        cost, pn = J(a)
        rows.append((tt, a, cost, pn))
        print(f"t={tt:.2f} α={np.round(a, 6)} J={cost:.6f} "
              f"PSNR={pn:.4f}", file=sys.stderr)

    costs = [r[2] for r in rows]
    print("\n## TGV faces_train valley sweep (float64 cost along "
          "α(t) = (1−t)·α_host_tr + t·α_tr_fused, "
          f"{args.iters}-iter inner)\n")
    print("| t | α₁ | α₀ | J(α) (f64) | PSNR |")
    print("|---|---|---|---|---|")
    for tt, a, cost, pn in rows:
        print(f"| {tt:.2f} | {a[0]:.6f} | {a[1]:.6f} "
              f"| {cost:.6f} | {pn:.4f} |")
    spread = (max(costs) - min(costs)) / min(costs)
    print(f"\nmax−min cost spread along the segment: {spread:.2e} "
          f"(relative)")
    print(f"J(α_host) = {costs[0]:.6f}, J(α_fused) = {costs[-1]:.6f}, "
          f"Δ = {costs[-1] - costs[0]:+.2e}")


if __name__ == "__main__":
    main()
