#!/usr/bin/env python
"""Measure VPU elementwise throughput in f32 vs bf16 (Pallas, VMEM-resident).

Settles the round-2 open question "is bf16 dual storage worth it in the
PDPS kernel?" with a direct measurement: a kernel that runs T iterations
of a PDPS-shaped elementwise chain (mul/add/rsqrt/select) on a
VMEM-resident block, in float32 and in bfloat16.  If bf16 shows no
throughput gain (v5e's VPU computes in f32; bf16 is a storage format, and
the PDPS state is already VMEM-resident so bandwidth is not the
bottleneck), bf16 storage cannot reach the ≥1.3× acceptance bar and is
rejected.

Run on the TPU:  python scripts/vpu_dtype_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 2000
SHAPE = (16, 128, 128)   # ~1 MiB f32: comfortably VMEM-resident


def _kernel(iters):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]

        def body(_, carry):
            u, v = carry
            # PDPS-shaped chain: ~10 ops/element/iter
            w = u * v + 0.25
            n2 = w * w + u * u
            s = lax.rsqrt(n2 + 1e-6)
            sel = jnp.where(n2 <= 0.5, w, w * s)
            return (sel + 0.1 * v, v * 0.999 + 0.001 * sel)

        u, v = lax.fori_loop(0, iters, body, (x, y))
        o_ref[:] = u + v

    return kernel


@functools.partial(jax.jit, static_argnames=("iters",))
def run(x, y, iters):
    return pl.pallas_call(
        _kernel(iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y)


def measure(dtype):
    x = jnp.linspace(0, 1, SHAPE[0] * SHAPE[1] * SHAPE[2],
                     dtype=jnp.float32).reshape(SHAPE).astype(dtype)
    y = (x * 0.5 + 0.1).astype(dtype)
    out = run(x, y, ITERS)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x, y, ITERS)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    elems = SHAPE[0] * SHAPE[1] * SHAPE[2]
    gops = 10 * elems * ITERS / best / 1e9
    return best, gops


def main():
    float(jnp.zeros(()))   # warm the tunnel
    for name, dt in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        try:
            best, gops = measure(dt)
            print(f"{name}: best {best * 1e3:.2f} ms  ~{gops:.0f} Gop/s")
        except Exception as e:   # Mosaic gaps (e.g. bf16 op support)
            print(f"{name}: unsupported ({type(e).__name__}: "
                  f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
