#!/usr/bin/env python
"""Profile the bilevel learning hot path.

Produces (a) a section-timer breakdown (PDPS / hypergradient / host) and
(b) an XLA profiler trace directory viewable in TensorBoard / Perfetto
(``--trace-dir``).  The in-loop wall-clock accounting (the reference's only
tracing facility, SURVEY.md §5) is in the ``<prefix>.txt`` perf logs; this
script adds the device-level view.

    python scripts/profile_bilevel.py --trace-dir /tmp/bpl_trace
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--backend", default="pallas", choices=["jnp", "pallas"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bpldenoising_tpu.data import testdataset
    from bpldenoising_tpu.learning import tv_learning_function
    from bpldenoising_tpu.models import tv_model
    from bpldenoising_tpu.solvers import denoise_pdps
    from bpldenoising_tpu.solvers.hypergrad import exact_hypergrad
    from bpldenoising_tpu.solvers.pdps_pallas import denoise_pdps_pallas
    from bpldenoising_tpu.utils import SectionTimer, trace

    true_, noisy = testdataset("faces_train_128_10")
    dt = jnp.float32
    ds = (jnp.asarray(true_, dt), jnp.asarray(noisy, dt))
    f, utrue = ds[1], ds[0]
    alpha = jnp.asarray(0.07, dt)
    model = tv_model()
    solve = (denoise_pdps_pallas if args.backend == "pallas"
             else denoise_pdps)
    float(jnp.zeros(()))  # warm device↔host path

    # compile everything once
    u = solve(f, (alpha,), model, maxiter=5000)
    hg = jax.jit(jax.vmap(
        lambda ui, ti: exact_hypergrad(ui, ti, (alpha,), model)[0][0]))
    hg(u, utrue).block_until_ready()
    ul, c, g = tv_learning_function(alpha, ds, 0.1, maxiter=5000,
                                    backend=args.backend)
    jax.block_until_ready(ul)

    timer = SectionTimer()
    with trace(args.trace_dir):
        for _ in range(args.repeats):
            with timer.section("pdps_5000_batch10"):
                u = solve(f, (alpha,), model, maxiter=5000)
                u.block_until_ready()
            with timer.section("exact_hypergrad_vmap10"):
                hg(u, utrue).block_until_ready()
            with timer.section("fused_learning_call"):
                ul, c, g = tv_learning_function(
                    alpha, ds, 0.1, maxiter=5000, backend=args.backend)
                jax.block_until_ready((ul, c, g))

    print(timer.report())
    if args.trace_dir:
        print(f"trace written to {args.trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
