"""f64 CPU adjudication: the three TGV learning methods agree.

Runs host trust region, fused trust region and the single-loop learner on
the SAME problem (circle_128_10, float64, jnp backends), then evaluates
the EXACT cost (20k-iteration inner solve) and PSNR at each method's
learned (α₁, α₀) — the adjudication protocol of
``scripts/sumregs_faces_valley.py`` applied to the TGV family.  Writes
``scripts/tgv_methods_valley.json`` and prints a FIDELITY.md-ready table.

Usage: python scripts/tgv_methods_valley.py [--quick]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpldenoising_tpu.bilevel import (bilevel_learn, bilevel_learn_tgv_fused,
                                      single_loop_tgv_learn)  # noqa: E402
from bpldenoising_tpu.data import testdataset  # noqa: E402
from bpldenoising_tpu.learning.tgv import (make_tgv_learning_function,
                                           tgv_learning_function)  # noqa: E402
from bpldenoising_tpu.metrics import psnr  # noqa: E402
from bpldenoising_tpu.utils.config import Params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dataset", default="circle")
    args = ap.parse_args()

    inner = 800 if args.quick else 3000
    outer = 6 if args.quick else 15
    sl_outer = 60 if args.quick else 300
    exact_iters = 4000 if args.quick else 20000

    true_, noisy = testdataset(args.dataset)
    ds = (jnp.asarray(np.asarray(true_), jnp.float64),
          jnp.asarray(np.asarray(noisy), jnp.float64))
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                    delta0=0.02, maxiter=outer, tol=1e-8, verbose_iter=0)
    x0 = np.array([0.05, 0.05])

    results = {}

    t0 = time.perf_counter()
    lf = make_tgv_learning_function(maxiter=inner, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=x0, params=params)
    results["tr_host"] = np.asarray(host.x)
    print(f"host TR done {time.perf_counter() - t0:.1f}s x={host.x}",
          file=sys.stderr)

    t0 = time.perf_counter()
    fused = bilevel_learn_tgv_fused(ds, xinit=x0, params=params,
                                    inner_maxiter=inner, inner_tol=None,
                                    backend="jnp")
    results["tr_fused"] = np.asarray(fused.x)
    print(f"fused TR done {time.perf_counter() - t0:.1f}s x={fused.x}",
          file=sys.stderr)

    t0 = time.perf_counter()
    sl = single_loop_tgv_learn(ds[0], ds[1], x0, outer=sl_outer,
                               n_inner=40, n_adj=10, lr=0.05)
    results["single_loop"] = np.asarray(sl.alpha)
    print(f"single-loop done {time.perf_counter() - t0:.1f}s x={sl.alpha}",
          file=sys.stderr)

    rows = []
    for name, x in results.items():
        u, cost, grad = tgv_learning_function(np.asarray(x), ds, 0.01,
                                              maxiter=exact_iters)
        p = float(np.mean(np.asarray(psnr(ds[0], u))))
        rows.append(dict(method=name, alpha=[float(a) for a in x],
                         cost=float(cost), psnr=p,
                         grad=[float(g) for g in np.asarray(grad)]))
        print(f"| {name} | [{x[0]:.6f}, {x[1]:.6f}] | {float(cost):.4f} "
              f"| {p:.4f} |")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tgv_methods_valley.json")
    with open(out, "w") as fh:
        json.dump(dict(dataset=args.dataset, quick=args.quick,
                       inner=inner, outer=outer, sl_outer=sl_outer,
                       exact_iters=exact_iters, rows=rows), fh, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
