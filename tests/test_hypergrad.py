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
