#!/usr/bin/env python
"""Sweep the fused-TR speed-mode inner budgets (inner_tol × check_every).

Reproduces the round-5 retune evidence (BASELINE.md "Round-5 inner-budget
retune"): the speed-mode warm inner solves were over-converging — PSNR and
final cost are identical at every tolerance in [1e-6, 2e-5] on the
flagship while walltime drops ~1.7×, and the learned α lands inside a
±2e-5 f32 noise band regardless (so looser budgets can sit CLOSER to the
round-1 parity target than tighter ones — 8.4e-7 at 5e-6/50 vs 1.04e-5 at
the old 1e-6/100).

Prints one row per (family, inner_tol, check_every): floor-subtracted
device walltime, learned parameters, Δα vs the family's committed
reference value, final cost, PSNR.  Parity mode (inner_tol=None) is not
swept — it is the reference's cold fixed-budget semantics and must stay
untouched.

Usage:
    python scripts/budget_sweep.py                  # flagship TV only
    python scripts/budget_sweep.py --families tv,tgv,vtv,tvl1
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bpldenoising_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

from bpldenoising_tpu.data import testdataset
from bpldenoising_tpu.metrics import psnr
from bpldenoising_tpu.utils.config import Params

FLAGSHIP_ALPHA = 0.069788     # bench.py parity target (round-1 f32)


def _params(outer, **kw):
    return Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                  maxiter=outer, tol=1e-5, verbose_iter=0) | kw


def _sync(o):
    jax.block_until_ready(o)
    for leaf in jax.tree_util.tree_leaves(o):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.inexact):
            float(jnp.sum(leaf))
            break
    return o


def _time(run, probe, n=4):
    """Min-of-n with an interleaved trivial-dispatch floor (bench.py
    protocol: the tunnel round-trip drifts on a minutes timescale, so the
    subtraction baseline is sampled AT the measurement)."""
    trivial = jax.jit(lambda x: x + 1.0)
    res = _sync(run())
    wall = floor = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(trivial(probe))
        floor = min(floor, time.perf_counter() - t0)
        t0 = time.perf_counter()
        res = _sync(run())
        wall = min(wall, time.perf_counter() - t0)
    return res, wall, floor


def row(tag, tol, ce, dev, d_ref, cost, psnr_db):
    print(f"{tag:5s} tol={tol:.0e} ce={ce:3d} device={dev:.4f}s "
          f"d_ref={d_ref:.2e} cost={cost:.4f} psnr={psnr_db:.3f}",
          flush=True)


def sweep_tv(grid):
    from bpldenoising_tpu.bilevel import bilevel_learn_fused
    from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
    t, n = testdataset("faces_train_128_10")
    ds = (jnp.asarray(t, jnp.float32), jnp.asarray(n, jnp.float32))
    cfg = HypergradConfig(al_iters=2, cg_maxiter=100)
    for tol, ce in grid:
        run = lambda: bilevel_learn_fused(
            ds, xinit=0.1, params=_params(20), inner_maxiter=5000,
            inner_tol=tol, check_every=ce, cfg=cfg, backend="pallas")
        res, w, fl = _time(run, ds[1])
        row("tv", tol, ce, w - fl, abs(float(res.x) - FLAGSHIP_ALPHA),
            float(res.cost),
            float(np.mean(np.asarray(psnr(ds[0], res.u)))))


def sweep_tgv(grid):
    from bpldenoising_tpu.bilevel.fused_tgv import bilevel_learn_tgv_fused
    t, n = testdataset("faces_train_128_10")
    ds = (jnp.asarray(t, jnp.float32), jnp.asarray(n, jnp.float32))
    ref = np.array([0.085244, 0.04417])    # host-path α (bench tgv_learned)
    for tol, ce in grid:
        run = lambda: bilevel_learn_tgv_fused(
            ds, xinit=np.array([0.05, 0.05]),
            params=_params(20, delta0=0.02), inner_maxiter=5000,
            inner_tol=tol, check_every=ce, backend="pallas")
        res, w, fl = _time(run, ds[1])
        row("tgv", tol, ce, w - fl,
            float(np.max(np.abs(np.asarray(res.x) - ref))),
            float(res.cost),
            float(np.mean(np.asarray(psnr(ds[0], res.u)))))


def sweep_vtv(grid):
    from bpldenoising_tpu.bilevel import bilevel_learn_vtv_fused
    ct, cd = testdataset("color_disks_128_10", color=True)
    cds = (jnp.asarray(ct, jnp.float32), jnp.asarray(cd, jnp.float32))
    for tol, ce in grid:
        run = lambda: bilevel_learn_vtv_fused(
            cds, xinit=np.asarray(0.05), params=_params(20, delta0=0.02),
            inner_maxiter=5000, inner_tol=tol, check_every=ce,
            backend="pallas")
        res, w, fl = _time(run, cds[1])
        row("vtv", tol, ce, w - fl, abs(float(res.x) - 0.165381),
            float(res.cost),
            float(np.mean(np.asarray(psnr(cds[0], res.u)))))


def sweep_tvl1(grid):
    from bpldenoising_tpu.bilevel import bilevel_learn_tvl1_fused
    spt, spd = testdataset("circle_sp_128_20")
    sp_ds = (np.asarray(spt), np.asarray(spd))
    probe = jnp.asarray(spd, jnp.float32)
    for tol, ce in grid:
        run = lambda: bilevel_learn_tvl1_fused(
            sp_ds, xinit=0.4, params=_params(15, delta0=0.1, alpha0=0.4),
            inner_maxiter=2000, inner_tol=tol, check_every=ce,
            backend="pallas")
        res, w, fl = _time(run, probe)
        row("tvl1", tol, ce, w - fl, abs(float(res.x) - 1.91081),
            float(res.cost),
            float(np.mean(np.asarray(psnr(jnp.asarray(np.asarray(spt),
                                                      jnp.float32),
                                          res.u)))))


SWEEPS = {"tv": sweep_tv, "tgv": sweep_tgv, "vtv": sweep_vtv,
          "tvl1": sweep_tvl1}
DEFAULT_GRID = [(1e-6, 100), (5e-6, 100), (5e-6, 50), (1e-5, 100),
                (1e-5, 50), (2e-5, 100)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="tv")
    args = ap.parse_args()
    for fam in args.families.split(","):
        SWEEPS[fam.strip()](DEFAULT_GRID)


if __name__ == "__main__":
    main()
