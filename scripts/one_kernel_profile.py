"""One-kernel learner per-outer-step overhead decomposition + CG A/B.

The round-3 roofline measured the resident one-kernel learner at 55.4% VPU
utilization at batch-10 (BASELINE.md "Roofline") and attributed the gap to
the per-outer-step serial segment.  This script decomposes that number on
live hardware and A/Bs the classic vs pipelined (Chronopoulos–Gear) adjoint
CG (``bilevel/pcg.py``):

* configs sweeping (n_inner, n_adj) at fixed outer isolate where the
  per-outer-step overhead lives (PD loop vs CG loop vs Adam segment);
* classic vs pipelined at the flagship config measures the sync-point
  saving directly (acceptance bar from VERDICT r4 #8: ≥1.2× on
  ``one_kernel_walltime_s``, else document closed).

Writes scripts/one_kernel_profile.json.

Usage:  python scripts/one_kernel_profile.py  [--quick]
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
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from bpldenoising_tpu.utils.compile_cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpldenoising_tpu.bilevel.first_order_pallas import single_loop_pallas
    from bpldenoising_tpu.data import testdataset
    from bpldenoising_tpu.models import tv_model

    true_, noisy = testdataset("faces_train_128_10")
    utrue = jnp.asarray(true_, jnp.float32)
    f = jnp.asarray(noisy, jnp.float32)
    float(jnp.zeros(()))   # warm the tunnel

    trivial = jax.jit(lambda x: x + 1.0)

    def sync(out):
        jax.block_until_ready(out)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype"):
                float(jnp.sum(leaf))
                break

    def measure(reps=5, **kw):
        run = lambda: single_loop_pallas(utrue, f, 0.1, tv_model(), **kw)
        sync(run())   # compile + warm
        wall = floor = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(trivial(f))
            floor = min(floor, time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(run())
            wall = min(wall, time.perf_counter() - t0)
        dev = wall - floor
        return round(wall, 4), round(dev if dev > 0.1 * wall else wall, 4)

    outer = 60 if args.quick else 300
    big_outer = 300 if args.quick else 3000
    out = {"device": str(jax.devices()[0]), "quick": bool(args.quick)}

    # --- decomposition at the roofline config (big outer amortizes) -------
    for tag, kw in (
        ("full", dict(outer=big_outer, n_inner=40, n_adj=11)),
        ("no_cg", dict(outer=big_outer, n_inner=40, n_adj=0)),
        ("min_pd", dict(outer=big_outer, n_inner=1, n_adj=11)),
        ("overhead_only", dict(outer=big_outer, n_inner=1, n_adj=0)),
    ):
        wall, dev = measure(**kw)
        out[f"{tag}_wall_s"] = wall
        out[f"{tag}_device_s"] = dev
        out[f"{tag}_per_outer_us"] = round(1e6 * dev / big_outer, 2)
        print(f"{tag}: {dev}s  ({out[f'{tag}_per_outer_us']} us/outer)",
              flush=True)

    # --- classic vs pipelined CG at the flagship bench config -------------
    for variant in ("classic", "pipelined"):
        wall, dev = measure(outer=outer, n_inner=40, n_adj=10,
                            cg_variant=variant)
        out[f"flagship_{variant}_wall_s"] = wall
        out[f"flagship_{variant}_device_s"] = dev
        xv, _, _ = single_loop_pallas(utrue, f, 0.1, tv_model(),
                                      outer=outer, n_inner=40, n_adj=10,
                                      cg_variant=variant)
        out[f"flagship_{variant}_alpha"] = round(float(xv), 6)
        print(f"flagship {variant}: {dev}s alpha={float(xv):.6f}",
              flush=True)

    # pipelined at the big config too (same shape as the roofline row)
    wall, dev = measure(outer=big_outer, n_inner=40, n_adj=11,
                        cg_variant="pipelined")
    out["full_pipelined_wall_s"] = wall
    out["full_pipelined_device_s"] = dev
    out["full_pipelined_per_outer_us"] = round(1e6 * dev / big_outer, 2)
    out["pipelined_speedup_full"] = round(
        out["full_device_s"] / dev, 3) if dev else None
    out["pipelined_speedup_flagship"] = round(
        out["flagship_classic_device_s"]
        / out["flagship_pipelined_device_s"], 3)
    print(f"pipelined speedup: full {out['pipelined_speedup_full']}x, "
          f"flagship {out['pipelined_speedup_flagship']}x", flush=True)

    path = os.path.join(os.path.dirname(__file__),
                        "one_kernel_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
