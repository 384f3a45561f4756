#!/usr/bin/env python
"""Adjudicate the sumregs-vector f32/f64 parameter deviation (FIDELITY row 3).

The f32 trajectory lands at a different α than the f64 oracle, with α₃
pinned at the positivity-box floor.  This script quantifies the claimed
"flat valley": it evaluates the float64 upper-level cost J(α) (20k-iteration
inner solves) at both learned minimizers and along the segment between
them, plus the axis direction that distinguishes them, and prints a
markdown table for FIDELITY.md.

Run on CPU:  python scripts/sumregs_valley.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.data import testdataset
from bpldenoising_tpu.learning import make_sumregs_learning_function
from bpldenoising_tpu.metrics import psnr
from bpldenoising_tpu.models import sumregs_model
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.utils.config import Params

MODEL = sumregs_model()
EVAL_ITERS = 20000


def learn(dtype):
    t, d = testdataset("circle_128_10")
    ds = (jnp.asarray(t[:1], dtype), jnp.asarray(d[:1], dtype))
    lf = make_sumregs_learning_function(maxiter=5000, backend="jnp")
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                    delta0=0.01, maxiter=20, tol=1e-5, verbose_iter=0)
    res = bilevel_learn(ds, lf, xinit=np.full(3, 1e-3), params=params)
    return np.asarray(res.x, np.float64), ds


def main():
    x64, _ = learn(jnp.float64)
    x32, _ = learn(jnp.float32)
    print(f"f64 minimizer: {x64}", file=sys.stderr)
    print(f"f32 minimizer: {x32}", file=sys.stderr)

    # f64 evaluation data (high-budget inner solves)
    t, d = testdataset("circle_128_10")
    utrue = jnp.asarray(t[:1], jnp.float64)
    f = jnp.asarray(d[:1], jnp.float64)

    def J(alpha):
        a = tuple(jnp.asarray(v, jnp.float64) for v in alpha)
        u = denoise_pdps(f, a, MODEL, maxiter=EVAL_ITERS)
        return (0.5 * float(jnp.sum((u - utrue) ** 2)),
                float(np.mean(np.asarray(psnr(utrue, u)))))

    rows = []
    for tt in np.linspace(0.0, 1.0, 11):
        a = (1 - tt) * x64 + tt * x32
        cost, pn = J(a)
        rows.append((tt, a, cost, pn))
        print(f"t={tt:.1f} α={np.round(a, 6)} J={cost:.6f} "
              f"PSNR={pn:.4f}", file=sys.stderr)

    costs = [r[2] for r in rows]
    print("\n## sumregs_vec_circle valley sweep (float64 cost along the "
          "segment α(t) = (1−t)·α_f64 + t·α_f32)\n")
    print("| t | α₁ | α₂ | α₃ | J(α) (f64, 20k inner) | PSNR |")
    print("|---|---|---|---|---|---|")
    for tt, a, cost, pn in rows:
        print(f"| {tt:.1f} | {a[0]:.6f} | {a[1]:.6f} | {a[2]:.2e} "
              f"| {cost:.6f} | {pn:.4f} |")
    spread = (max(costs) - min(costs)) / min(costs)
    print(f"\nmax−min cost spread along the segment: {spread:.2e} "
          f"(relative)")
    print(f"J(α_f64) = {costs[0]:.6f}, J(α_f32) = {costs[-1]:.6f}, "
          f"Δ = {costs[-1] - costs[0]:+.2e}")


if __name__ == "__main__":
    main()
