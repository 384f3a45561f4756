#!/usr/bin/env python
"""Prototype: geometric-multigrid-preconditioned CG for the adjoint system.

Motivation (round 5): the flagship's warm in-loop adjoint CG caps at
``cg_maxiter=100`` on 9/10 trust-region iterations (bench
``flagship_adjoint_cg_all_converged: False``) — the exact AL system
M = I + Gᵀ[μ·act + inact·α·H]G is a screened anisotropic Laplacian whose
active-set penalty μ = 1e2 (f32) puts smooth error modes far outside what
a Jacobi preconditioner can damp (measured: ~570 Jacobi-PCG iterations to
tol 1e-5 cold).  Geometric multigrid is the textbook fix for exactly this
operator class: a V-cycle on the per-component *diagonal approximation*
Ã = I + s·Gᵀ(w̃ ⊙ G·) (dropping the rank-one Gu GuᵀGu/den³ coupling, which
only perturbs the inactive set where weights are O(α)) should contract
smooth modes h-independently, leaving PCG a short fight.

This script measures, at the REAL flagship converged state
(faces_train_128_10, α ≈ 0.06980):

  1. Jacobi-PCG cold iterations + device time   (current behaviour)
  2. MG(V)-PCG cold iterations + device time    (candidate)

both at the bench's accuracy grade (tol 1e-5, f32, joint batched system —
the same system ``solvers/hypergrad_pallas.py`` solves in-kernel).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bpldenoising_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

from bpldenoising_tpu.bilevel import bilevel_learn_fused
from bpldenoising_tpu.data import testdataset
from bpldenoising_tpu.models import tv_model
from bpldenoising_tpu.ops import scalarprod, xi
from bpldenoising_tpu.solvers.hypergrad import HypergradConfig, _defaults
from bpldenoising_tpu.solvers.krylov import cg
from bpldenoising_tpu.utils.config import Params


def build_exact_system(u, alpha, model, cfg):
    """The exact AL system (al_iters=1 slice: pure SPD operator), plus the
    per-component diagonal weight field w̃ the MG hierarchy coarsens."""
    dtype = u.dtype
    act_tol, mu, cg_tol = _defaults(dtype, cfg)
    op = model.ops[0]
    Gu = op.apply(u)
    nGu = xi(Gu)
    act = (nGu < act_tol).astype(dtype)
    inact = 1.0 - act
    den = jnp.where(act > 0, 1.0, nGu)

    def bcast(m):
        return m[..., None, :, :]

    def M_apply(p):
        Gp = op.apply(p)
        curv = Gp * bcast(1.0 / den) - Gu * bcast(
            scalarprod(Gu, Gp) / den ** 3)
        w = (mu * bcast(act)) * Gp + bcast(inact) * alpha * curv
        return p + op.apply_adjoint(w)

    # per-axis diagonal weights (what Jacobi uses; what MG coarsens)
    h_diag = bcast(1.0 / den) - Gu ** 2 * bcast(1.0 / den ** 3)
    w_diag = mu * bcast(act) + bcast(inact) * alpha * h_diag
    diag = 1.0 + op.gram_diag(w_diag)
    return M_apply, w_diag, diag, cg_tol


def restrict2(x):
    s = x.shape
    return x.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2)).mean((-3, -1))


def prolong2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def make_vcycle(op, w_fine, n_levels=4, nu=2, omega=0.8, coarse_sweeps=10):
    """Symmetric V(nu,nu) cycle on Ã_l = I + s_l·Gᵀ(w_l ⊙ G·), s_l = 4^{-l}.

    Piecewise-constant prolongation / 2×2-mean restriction (P = 4Rᵀ — the
    scalar keeps the cycle SPD), damped-Jacobi smoothing with the exact
    level diagonal, rediscretized coarse operators (unit-spacing stencils,
    so the Gram weight scales by 1/4 per level).
    """
    levels = []
    w = w_fine
    for lev in range(n_levels):
        s = 0.25 ** lev

        def A(p, w=w, s=s):
            return p + s * op.apply_adjoint(w * op.apply(p))

        diag = 1.0 + s * op.gram_diag(w)
        levels.append((A, 1.0 / diag))
        if lev < n_levels - 1:
            w = restrict2(w)

    def cycle(level, b):
        A, invd = levels[level]
        x = jnp.zeros_like(b)
        if level == n_levels - 1:
            for _ in range(coarse_sweeps):
                x = x + omega * invd * (b - A(x))
            return x
        for _ in range(nu):
            x = x + omega * invd * (b - A(x))
        x = x + prolong2(cycle(level + 1, restrict2(b - A(x))))
        for _ in range(nu):
            x = x + omega * invd * (b - A(x))
        return x

    return lambda r: cycle(0, r)


def main():
    true_, noisy = testdataset("faces_train_128_10")
    ds = (jnp.asarray(true_, jnp.float32), jnp.asarray(noisy, jnp.float32))
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                    maxiter=20, tol=1e-5, verbose_iter=0)
    cfg = HypergradConfig(al_iters=2, cg_maxiter=100)
    res = bilevel_learn_fused(ds, xinit=0.1, params=params,
                              inner_maxiter=5000, inner_tol=1e-6,
                              check_every=100, cfg=cfg, backend="pallas")
    jax.block_until_ready(res)
    u, alpha = res.u, jnp.asarray(float(res.x), jnp.float32)
    print(f"flagship state: alpha={float(res.x):.6f}")

    model = tv_model()
    M_apply, w_diag, diag, cg_tol = build_exact_system(u, alpha, model, cfg)
    rhs = u - ds[0]
    inv_diag = 1.0 / diag

    @jax.jit
    def solve_jacobi(b):
        return cg(M_apply, b, tol=cg_tol, maxiter=2000,
                  M=lambda r: inv_diag * r)

    op = model.ops[0]

    def run(tag, fn, b):
        x, info = jax.block_until_ready(fn(b))
        t0 = time.perf_counter()
        x, info = jax.block_until_ready(fn(b))
        dt = time.perf_counter() - t0
        # true residual check (preconditioner bugs can fake convergence)
        r = float(jnp.linalg.norm((b - M_apply(x)).ravel())
                  / jnp.linalg.norm(b.ravel()))
        print(f"{tag:28s} iters={int(info.iters):5d} "
              f"conv={bool(info.converged)} time={dt*1e3:7.2f} ms "
              f"true_rel_res={r:.3e}")
        return int(info.iters), dt

    it_j, t_j = run("jacobi-pcg (current)", solve_jacobi, rhs)

    for n_levels in (3, 4, 5):
        for nu in (1, 2):
            vc = make_vcycle(op, w_diag, n_levels=n_levels, nu=nu)

            @jax.jit
            def solve_mg(b, vc=vc):
                return cg(M_apply, b, tol=cg_tol, maxiter=400, M=vc)

            run(f"mg-pcg L={n_levels} nu={nu}", solve_mg, rhs)


if __name__ == "__main__":
    main()
