"""Hypergradient tests against finite-difference oracles (SURVEY.md §7 step 4:
"Oracle: finite-difference dJ/dα on tiny (8×8–32×32) images in x64 mode").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.ops import PatchOp
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.solvers.hypergrad import (
    HypergradConfig,
    exact_hypergrad,
    reg_hypergrad,
)

MAXITER = 20000  # converge the inner problem hard so FD is meaningful


def problem(rng, shape=(16, 16), sigma=0.1):
    x, y = np.meshgrid(np.arange(shape[1]), np.arange(shape[0]))
    clean = ((x - shape[1] / 2) ** 2 + (y - shape[0] / 2) ** 2
             < (shape[0] / 3) ** 2).astype(np.float64)
    noisy = clean + sigma * rng.standard_normal(shape)
    return jnp.asarray(clean), jnp.asarray(noisy)


def cost(model, f, utrue, alphas):
    u = denoise_pdps(f, alphas, model, maxiter=MAXITER)
    return 0.5 * float(jnp.sum((u - utrue) ** 2))


def fd_grad(model, f, utrue, alphas, k, h=1e-5):
    """Central difference in the k-th alpha component (all scalars)."""
    a_plus = list(alphas)
    a_minus = list(alphas)
    a_plus[k] = alphas[k] + h
    a_minus[k] = alphas[k] - h
    return (cost(model, f, utrue, tuple(a_plus))
            - cost(model, f, utrue, tuple(a_minus))) / (2 * h)


class TestTVScalar:
    alpha = 0.08

    def test_exact_matches_fd(self, rng):
        utrue, f = problem(rng)
        model = tv_model()
        u = denoise_pdps(f, (self.alpha,), model, maxiter=MAXITER)
        (g,), _, info = exact_hypergrad(u, utrue, (jnp.asarray(self.alpha),), model)
        g_fd = fd_grad(model, f, utrue, (self.alpha,), 0)
        assert bool(info.converged), f"CG did not converge: {info}"
        np.testing.assert_allclose(float(g), g_fd, rtol=2e-3)

    def test_reg_matches_fd(self, rng):
        utrue, f = problem(rng)
        model = tv_model()
        u = denoise_pdps(f, (self.alpha,), model, maxiter=MAXITER)
        (g,), _, info = reg_hypergrad(u, utrue, (jnp.asarray(self.alpha),), model)
        g_fd = fd_grad(model, f, utrue, (self.alpha,), 0)
        np.testing.assert_allclose(float(g), g_fd, rtol=5e-3)

    def test_reg_close_to_exact(self, rng):
        utrue, f = problem(rng)
        model = tv_model()
        u = denoise_pdps(f, (self.alpha,), model, maxiter=MAXITER)
        a = (jnp.asarray(self.alpha),)
        (ge,), _, _ = exact_hypergrad(u, utrue, a, model)
        (gr,), _, _ = reg_hypergrad(u, utrue, a, model)
        np.testing.assert_allclose(float(ge), float(gr), rtol=5e-3)


class TestSumRegsVector:
    alphas = (0.05, 0.03, 0.02)

    def test_exact_matches_fd(self, rng):
        utrue, f = problem(rng)
        model = sumregs_model()
        u = denoise_pdps(f, self.alphas, model, maxiter=MAXITER)
        a = tuple(jnp.asarray(a) for a in self.alphas)
        grads, _, info = exact_hypergrad(u, utrue, a, model)
        assert bool(info.converged)
        for k in range(3):
            g_fd = fd_grad(model, f, utrue, self.alphas, k)
            np.testing.assert_allclose(float(grads[k]), g_fd, rtol=5e-3,
                                       err_msg=f"component {k}")

    def test_reg_matches_fd(self, rng):
        utrue, f = problem(rng)
        model = sumregs_model()
        u = denoise_pdps(f, self.alphas, model, maxiter=MAXITER)
        a = tuple(jnp.asarray(a) for a in self.alphas)
        cfg = HypergradConfig(gamma=1e8)
        grads, _, _ = reg_hypergrad(u, utrue, a, model, cfg)
        for k in range(3):
            g_fd = fd_grad(model, f, utrue, self.alphas, k)
            np.testing.assert_allclose(float(grads[k]), g_fd, rtol=1e-2,
                                       err_msg=f"component {k}")


class TestTVPatch:
    """2×2 patch parameter on a 16×16 image (ref `:219-254` semantics)."""

    def test_exact_patch_matches_fd(self, rng):
        utrue, f = problem(rng)
        model = tv_model()
        pop = PatchOp((2, 2), (16, 16))
        x = jnp.full((2, 2), 0.08)
        amap = pop.apply(x)
        u = denoise_pdps(f, (amap,), model, maxiter=MAXITER)
        (gmap,), _, info = exact_hypergrad(u, utrue, (amap,), model,
                                           want_maps=True)
        g = pop.apply_adjoint(gmap)
        assert bool(info.converged)
        h = 1e-5
        for i in range(2):
            for j in range(2):
                xp = x.at[i, j].add(h)
                xm = x.at[i, j].add(-h)
                jp = cost(model, f, utrue, (pop.apply(xp),))
                jm = cost(model, f, utrue, (pop.apply(xm),))
                g_fd = (jp - jm) / (2 * h)
                np.testing.assert_allclose(float(g[i, j]), g_fd, rtol=2e-2,
                                           atol=1e-4,
                                           err_msg=f"patch ({i},{j})")

    def test_reg_patch_runs_and_matches_exact(self, rng):
        utrue, f = problem(rng)
        model = tv_model()
        pop = PatchOp((2, 2), (16, 16))
        amap = pop.apply(jnp.full((2, 2), 0.08))
        u = denoise_pdps(f, (amap,), model, maxiter=MAXITER)
        (ge,), _, _ = exact_hypergrad(u, utrue, (amap,), model, want_maps=True)
        (gr,), _, _ = reg_hypergrad(u, utrue, (amap,), model, want_maps=True)
        np.testing.assert_allclose(
            np.asarray(pop.apply_adjoint(ge)),
            np.asarray(pop.apply_adjoint(gr)), rtol=2e-2)


class TestAugmentedLagrangianExactness:
    """Round-2: the AL multiplier iteration removes the penalty bias.

    Oracle: the reference's exact KKT system (`src/TVLearningFunctionVec.jl
    :127-131` — eps()-scaled active blocks, i.e. penalty μ → ∞) assembled
    DENSELY after the SPD elimination M = I + Gᵀ[μ·act + inact·α·H]G and
    solved directly at μ = 1e15 in float64 on a tiny image.  This pins
    "exact" far tighter than finite differences can (FD error is bounded by
    inner-solve convergence ÷ h ≈ 1e-4 here).
    """

    def _dense_exact(self, u, utrue, alpha, model):
        """ε → 0 limit of the reference system, written as the
        equality-constrained QP it converges to:

            min_p ½pᵀM₀p − rhsᵀp   s.t.  (Gp)|_act = 0,
            M₀ = I + Gᵀ(inact·α·H)G

        solved via the well-conditioned dense KKT saddle system (a direct
        penalty solve at μ=1e15 destroys all digits: κ(M_μ) ≈ μ)."""
        import numpy as np
        op = model.ops[0]
        n = u.size
        G = np.asarray(op.as_matrix(u.shape))          # (2n, n), x-rows first
        Gu = G @ np.asarray(u).ravel()
        gx, gy = Gu[:n], Gu[n:]
        nGu = np.sqrt(gx ** 2 + gy ** 2)
        act = nGu < 1e-9
        den = np.where(act, 1.0, nGu)
        # per-pixel inactive curvature block α·(I2 − ĝĝᵀ)/den
        W = np.zeros((2 * n, 2 * n))
        for i in range(n):
            idx = np.array([i, n + i])
            if not act[i]:
                g = np.array([gx[i], gy[i]]) / nGu[i]
                W[np.ix_(idx, idx)] = (alpha / den[i]) * (
                    np.eye(2) - np.outer(g, g))
        M0 = np.eye(n) + G.T @ W @ G
        C = G[np.r_[np.flatnonzero(act), n + np.flatnonzero(act)], :]
        m = C.shape[0]
        KKT = np.block([[M0, C.T], [C, np.zeros((m, m))]])
        rhs = np.concatenate([np.asarray(u - utrue).ravel(), np.zeros(m)])
        # lstsq: active-set constraints can be linearly dependent (fwd-diff
        # boundary rows are identically zero), making the multiplier block
        # rank-deficient; p itself is unique (M0 is SPD on the nullspace)
        p = np.linalg.lstsq(KKT, rhs, rcond=None)[0][:n]
        field = np.where(act, 0.0, 1.0 / den)[np.r_[0:n, 0:n]] * Gu
        return float(-(G @ p) @ field), p

    def test_al_matches_dense_kkt_oracle(self, rng):
        utrue, f = problem(rng, shape=(12, 12))
        model = tv_model()
        alpha = 0.08
        u = denoise_pdps(f, (alpha,), model, maxiter=MAXITER)
        g_dense, p_dense = self._dense_exact(u, utrue, alpha, model)
        cfg = HypergradConfig(mu=1e2, al_iters=6, cg_tol=1e-12,
                              cg_maxiter=20000)
        (g,), p, _ = exact_hypergrad(u, utrue, (jnp.asarray(alpha),), model,
                                     cfg)
        np.testing.assert_allclose(float(g), g_dense, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(p).ravel(), p_dense, atol=1e-8)

    def test_mu_invariance(self, rng):
        """The converged AL gradient must not depend on the penalty choice
        (round 1's single-solve penalty had O(1/μ) bias)."""
        utrue, f = problem(rng)
        model = tv_model()
        alpha = 0.08
        u = denoise_pdps(f, (alpha,), model, maxiter=MAXITER)
        grads = []
        for mu in (1e2, 1e3, 1e4, 1e6):
            cfg = HypergradConfig(mu=mu, al_iters=6, cg_tol=1e-12,
                                  cg_maxiter=20000)
            (g,), _, _ = exact_hypergrad(u, utrue, (jnp.asarray(alpha),),
                                         model, cfg)
            grads.append(float(g))
        # round-1's single-solve penalty differed by ~1e-3..1e-2 over this
        # same μ range; the AL iteration is invariant to a few ×1e-6 (the
        # residual contraction at the smallest μ)
        for g in grads[1:]:
            np.testing.assert_allclose(g, grads[0], rtol=1e-5)

    def test_f32_defaults_match_f64_oracle(self, rng):
        """VERDICT #9: constants hardening — the f32 default config stays
        within 1% of the f64 oracle across inner budgets and μ choices."""
        utrue, f = problem(rng)
        model = tv_model()
        alpha = 0.08
        u64 = denoise_pdps(f, (alpha,), model, maxiter=MAXITER)
        cfg64 = HypergradConfig(al_iters=6, cg_tol=1e-12, cg_maxiter=20000)
        (g64,), _, _ = exact_hypergrad(u64, utrue, (jnp.asarray(alpha),),
                                       model, cfg64)
        for inner in (2000, 5000, 20000):
            u32 = denoise_pdps(f.astype(jnp.float32), (alpha,), model,
                               maxiter=inner)
            for mu in (1e2, 1e3):
                cfg = HypergradConfig(mu=mu, cg_maxiter=5000)
                (g32,), _, _ = exact_hypergrad(
                    u32, utrue.astype(jnp.float32),
                    (jnp.asarray(alpha, jnp.float32),), model, cfg)
                assert abs(float(g32) - float(g64)) < 0.01 * abs(float(g64)), (
                    f"inner={inner} mu={mu}: {float(g32)} vs {float(g64)}")

    def test_batched_joint_solve_matches_per_image(self, rng):
        """exact_hypergrad on an (O, M, N) stack (one joint block-diagonal
        CG) must match the per-image vmap form; the summed gradient is the
        dataset hypergradient."""
        model = tv_model()
        alpha = 0.08
        stacks = [problem(rng) for _ in range(3)]
        utrue = jnp.stack([s[0] for s in stacks])
        f = jnp.stack([s[1] for s in stacks])
        u = denoise_pdps(f, (alpha,), model, maxiter=MAXITER)
        cfg = HypergradConfig(cg_tol=1e-12, cg_maxiter=20000)
        (g_joint,), p_joint, _ = exact_hypergrad(
            u, utrue, (jnp.asarray(alpha),), model, cfg)
        g_sum = 0.0
        for i in range(3):
            (gi,), _, _ = exact_hypergrad(u[i], utrue[i],
                                          (jnp.asarray(alpha),), model, cfg)
            g_sum += float(gi)
        np.testing.assert_allclose(float(g_joint), g_sum, rtol=1e-8)
