#!/usr/bin/env python
"""Adjudicate the faces sumregs α₃ disagreement (VERDICT r2 item 3).

On ``faces_train_128_10`` the fused trust-region path learns
α ≈ [0.0352, 0.0324, 0] (α₃ at the positivity floor) while the one-kernel
single-loop learner lands at α ≈ [0.0324, 0.0322, 0.0062].  Same protocol
as ``scripts/sumregs_valley.py`` (which adjudicated the circle case as a
flat valley): evaluate the float64 upper-level cost J(α) with high-budget
inner solves at both minimizers and along the segment between them, and
print a FIDELITY.md-ready table.

Run on CPU:  python scripts/sumregs_faces_valley.py [--iters 10000]
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
from bpldenoising_tpu.metrics import psnr
from bpldenoising_tpu.models import sumregs_model
from bpldenoising_tpu.solvers import denoise_pdps

MODEL = sumregs_model()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000,
                    help="f64 inner-solve budget per evaluation")
    ap.add_argument("--tr", default="0.035202,0.032438,0.0",
                    help="trust-region minimizer (BENCH_r02 sumregs_alpha)")
    ap.add_argument("--ok", default="0.032398,0.032238,0.006236",
                    help="one-kernel minimizer (one_kernel_sumregs_alpha)")
    ap.add_argument("--points", type=int, default=9)
    args = ap.parse_args()

    x_tr = np.asarray([float(v) for v in args.tr.split(",")])
    x_ok = np.asarray([float(v) for v in args.ok.split(",")])

    t, d = testdataset("faces_train_128_10")
    utrue = jnp.asarray(t, jnp.float64)
    f = jnp.asarray(d, jnp.float64)

    def J(alpha):
        a = tuple(jnp.asarray(max(v, 0.0), jnp.float64) for v in alpha)
        u = denoise_pdps(f, a, MODEL, maxiter=args.iters)
        return (0.5 * float(jnp.sum((u - utrue) ** 2)),
                float(np.mean(np.asarray(psnr(utrue, u)))))

    rows = []
    for tt in np.linspace(0.0, 1.0, args.points):
        a = (1 - tt) * x_tr + tt * x_ok
        cost, pn = J(a)
        rows.append((tt, a, cost, pn))
        print(f"t={tt:.2f} α={np.round(a, 6)} J={cost:.6f} "
              f"PSNR={pn:.4f}", file=sys.stderr)

    costs = [r[2] for r in rows]
    print("\n## sumregs faces_train valley sweep (float64 cost along "
          "α(t) = (1−t)·α_tr_fused + t·α_one_kernel, "
          f"{args.iters}-iter inner)\n")
    print("| t | α₁ | α₂ | α₃ | J(α) (f64) | PSNR |")
    print("|---|---|---|---|---|---|")
    for tt, a, cost, pn in rows:
        print(f"| {tt:.2f} | {a[0]:.6f} | {a[1]:.6f} | {a[2]:.2e} "
              f"| {cost:.6f} | {pn:.4f} |")
    spread = (max(costs) - min(costs)) / min(costs)
    print(f"\nmax−min cost spread along the segment: {spread:.2e} "
          f"(relative)")
    print(f"J(α_tr) = {costs[0]:.6f}, J(α_ok) = {costs[-1]:.6f}, "
          f"Δ = {costs[-1] - costs[0]:+.2e}")


if __name__ == "__main__":
    main()
