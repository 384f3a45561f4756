#!/usr/bin/env python
"""Roofline/MFU accounting for the three hot kernel families.

Measures sustained VPU utilization for (a) the fused PDPS denoiser at
batch-256, (b) the fused AL hypergradient kernel, and (c) the one-kernel
single-loop learner, against the audited per-pixel op counts below and the
v5e VPU f32 peak.  All three are pure elementwise/stencil kernels with
VMEM-resident state, so the VPU is the relevant ceiling (no matmuls; the
MXU-stencil formulation was rejected by arithmetic — BASELINE.md
"Roofline").

Audited VPU op counts per pixel-stage-iteration (K=1, f32; rolls counted
as one op each — a Mosaic roll is roughly one vector op per element):

- PDPS accelerated-CP iteration (``pdps_pallas._pd_body``): 32 arith +
  6 rolls = **38**  (divergence 7, primal update 4, relaxation 3,
  gradient 4, dual update 4 + norm 3 + projection 5, dual write 2)
- hypergradient CG iteration (``hypergrad_pallas._hg_kernel`` exact,
  scalar α): 44 arith + 4 rolls = **48**  (M_apply: gradient 4 +
  dot3 6 + weighting 15 + divergence 7 + accumulate 1 = 33; CG vector
  updates + reductions ≈ 11)
- one-kernel learner (``first_order_pallas._learner_math``):
  PD step (unaccelerated) 29 arith + 4 rolls = **33**; adjoint CG
  iteration **45** (M_apply 30 + CG overhead 11 + 4 rolls); per-outer
  gradient-map assembly + pullback ≈ **12** (Adam runs on scalars —
  negligible per-pixel)
- coupled VTV accelerated-CP iteration (``vtv_pallas._vtv_body``), per
  CHANNEL-pixel: the TV stencil work (divergence 7, primal 4,
  relaxation 3, gradient 4, dual update 2, dual write/scale 2 = 22 + 6
  rolls = 28) plus the per-channel share of the shared Frobenius
  projection (norm accumulate 4 + a THIRD of the compare/rsqrt/select
  ≈ 2) ≈ **33** — the coupling amortizes the projection across
  channels, which is why the coupled kernel clocks a HIGHER
  utilization-per-op than scalar TV

Fixed-work configurations (``cg_tol=0`` forces the full CG budget; the
learner and PDPS budgets are static), timed with the scalar-reduce sync
and an interleaved dispatch-floor subtraction (the tunnel's round-trip
drifts on a minutes timescale).

CAVEAT — the audit counts SOURCE-LEVEL ops, not issued instructions:
the VPU's ALUs execute fused multiply-adds, so a kernel whose body is
FMA-rich can exceed 100% of the no-FMA bound below (observed on the
coupled VTV kernel, whose primal/dual updates and norm accumulation are
FMA chains and whose projection cost amortizes across channels).
Utilization >100% therefore reads as "past the scalar-issue roofline,
into FMA territory" — i.e. at the hardware ceiling — not as a timing
error (the scalar-reduce sync rules that out).

Usage:  python scripts/roofline.py            # one JSON line on stdout
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

VPU_PEAK_F32 = 3.85e12          # 8×128 lanes × 4 ALUs × ~0.94 GHz
OPS_PDPS = 38.0
OPS_HG_CG = 48.0
OPS_OK_PD = 33.0
OPS_OK_CG = 45.0
OPS_OK_OUTER = 12.0
OPS_VTV = 33.0


def _timed(fn, trivial, n=3):
    """min-of-n walltime with interleaved dispatch-floor subtraction."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        jax.block_until_ready(out)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                    leaf.dtype, jnp.inexact):
                float(jnp.sum(leaf))
                break
        return out

    sync(fn())   # compile + warm
    best = floor = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(trivial())
        floor = min(floor, time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, 1e-9)


def main() -> None:
    from bpldenoising_tpu.utils.compile_cache import enable
    enable()

    import jax
    import jax.numpy as jnp

    from bpldenoising_tpu.bilevel.first_order_pallas import (
        single_loop_tv_pallas)
    from bpldenoising_tpu.data import testdataset
    from bpldenoising_tpu.models import tv_model
    from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
    from bpldenoising_tpu.solvers.hypergrad_pallas import (
        exact_hypergrad_pallas)
    from bpldenoising_tpu.solvers.pdps_pallas import denoise_pdps_pallas

    model = tv_model()
    true_, noisy = testdataset("faces_train_128_10")
    f = jnp.asarray(noisy, jnp.float32)
    utrue = jnp.asarray(true_, jnp.float32)
    B, M, N = f.shape
    pix = B * M * N
    float(jnp.zeros(()))
    trivial = jax.jit(lambda: jnp.sum(f) * 0 + 1.0)

    out = {"vpu_peak_top_s": VPU_PEAK_F32}

    # (a) fused PDPS, batch-256, fixed 3000 iterations
    big = jnp.tile(f, (26, 1, 1))[:256]
    iters = 3000
    wall = _timed(lambda: denoise_pdps_pallas(big, (0.1,), model,
                                              maxiter=iters), trivial)
    rate = 256 * M * N * iters / wall
    out["pdps_b256"] = {
        "wall_s": round(wall, 4),
        "gpix_iter_per_s": round(rate / 1e9, 2),
        "ops_per_pix_iter": OPS_PDPS,
        "vpu_util_pct": round(100 * rate * OPS_PDPS / VPU_PEAK_F32, 1),
    }

    # (b) fused AL hypergradient, batch-10, fixed 2×25000 CG iterations
    # (cg_tol=0 disables the relative-residual stop)
    u = denoise_pdps_pallas(f, (0.07,), model, maxiter=2000)
    cg_n = 25000
    cfg = HypergradConfig(al_iters=2, cg_maxiter=cg_n, cg_tol=0.0)
    wall = _timed(lambda: exact_hypergrad_pallas(u, utrue, (0.07,), model,
                                                 cfg), trivial)
    rate = pix * 2 * cg_n / wall
    out["hypergrad_b10"] = {
        "wall_s": round(wall, 4),
        "gpix_cgiter_per_s": round(rate / 1e9, 2),
        "ops_per_pix_cgiter": OPS_HG_CG,
        "vpu_util_pct": round(100 * rate * OPS_HG_CG / VPU_PEAK_F32, 1),
    }

    # (c) one-kernel learner, batch-10, 3000 outer × (40 PD + 10+1 CG)
    outer, n_inner, n_adj = 3000, 40, 10
    wall = _timed(lambda: single_loop_tv_pallas(
        utrue, f, alpha0=0.1, outer=outer, n_inner=n_inner, n_adj=n_adj,
        lr=0.05)[0], trivial)
    ops_per_outer_pix = (n_inner * OPS_OK_PD + (n_adj + 1) * OPS_OK_CG
                         + OPS_OK_OUTER)
    total_ops = pix * outer * ops_per_outer_pix
    out["one_kernel_b10"] = {
        "wall_s": round(wall, 4),
        "ops_per_outer_pix": ops_per_outer_pix,
        "vpu_util_pct": round(100 * total_ops / wall / VPU_PEAK_F32, 1),
    }

    # (d) coupled (color) VTV kernel, batch-64 RGB, fixed 2000 iterations
    from bpldenoising_tpu.data import testdataset as _td
    from bpldenoising_tpu.solvers.vtv_pallas import vtv_denoise_pdps_pallas
    _, cd = _td("color_disks_128_10", color=True)
    cbig = jnp.tile(jnp.asarray(cd, jnp.float32), (7, 1, 1, 1))[:64]
    iters = 2000
    wall = _timed(lambda: vtv_denoise_pdps_pallas(cbig, 0.1,
                                                  maxiter=iters), trivial)
    rate = 64 * 3 * M * N * iters / wall      # channel-pixels
    out["vtv_b64"] = {
        "wall_s": round(wall, 4),
        "gcpix_iter_per_s": round(rate / 1e9, 2),
        "ops_per_cpix_iter": OPS_VTV,
        "vpu_util_pct": round(100 * rate * OPS_VTV / VPU_PEAK_F32, 1),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
