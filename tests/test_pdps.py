"""PDPS solver tests (SURVEY.md §4: fixed-point/energy/oracle checks).

The reference never early-stops and verifies visually; here we assert the
actual variational optimality conditions of
``min_u ½‖u−f‖² + Σₖ‖αₖGₖu‖₂,₁`` hold at the computed solution.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.ops import FwdGradientOp, xi
from bpldenoising_tpu.solvers import denoise_pdps, sumregs_denoise, tv_denoise


def noisy_image(rng, shape=(32, 32), sigma=0.1):
    x, y = np.meshgrid(np.arange(shape[1]), np.arange(shape[0]))
    clean = ((x - shape[1] / 2) ** 2 + (y - shape[0] / 2) ** 2
             < (shape[0] / 3) ** 2).astype(np.float64)
    noisy = clean + sigma * rng.standard_normal(shape)
    return jnp.asarray(clean), jnp.asarray(noisy)


class TestTVDenoise:
    def test_energy_below_data(self, rng):
        _, f = noisy_image(rng)
        model = tv_model()
        u = tv_denoise(f, 0.1, maxiter=2000)
        assert float(model.energy(u, f, 0.1)) < float(model.energy(f, f, 0.1))

    def test_kkt_residual(self, rng):
        """At the optimum: u = f − Gᵀy, ‖y‖₂,∞ ≤ α, y·Gu = α|Gu| where Gu≠0."""
        _, f = noisy_image(rng)
        alpha = 0.1
        u, (y,), _ = tv_denoise(f, alpha, maxiter=8000, return_dual=True)
        op = FwdGradientOp()
        # primal feasibility of the fixed point
        res = u - (f - op.apply_adjoint(y))
        assert float(jnp.abs(res).max()) < 3e-4
        # dual feasibility
        assert float(xi(y).max()) <= alpha * (1 + 1e-8)
        # alignment on strongly-inactive pixels
        gu = op.apply(u)
        ngu = xi(gu)
        mask = ngu > 1e-3
        align = jnp.where(mask, jnp.sum(y * gu, axis=0) - alpha * ngu, 0.0)
        assert float(jnp.abs(align).max()) < 1e-4

    def test_alpha_zero_returns_data(self, rng):
        _, f = noisy_image(rng)
        u = tv_denoise(f, 0.0, maxiter=500)
        np.testing.assert_allclose(u, f, atol=1e-10)

    def test_alpha_large_flattens_to_mean(self, rng):
        _, f = noisy_image(rng, shape=(16, 16))
        u = tv_denoise(f, 1e3, maxiter=8000)
        assert float(jnp.abs(u - jnp.mean(f)).max()) < 1e-3

    def test_denoising_reduces_error(self, rng):
        clean, f = noisy_image(rng)
        u = tv_denoise(f, 0.08, maxiter=3000)
        assert float(jnp.mean((u - clean) ** 2)) < 0.5 * float(
            jnp.mean((f - clean) ** 2))

    def test_batch_matches_per_image(self, rng):
        _, f1 = noisy_image(rng)
        _, f2 = noisy_image(rng)
        batch = jnp.stack([f1, f2])
        ub = tv_denoise(batch, 0.1, maxiter=1000)
        u1 = tv_denoise(f1, 0.1, maxiter=1000)
        u2 = tv_denoise(f2, 0.1, maxiter=1000)
        np.testing.assert_allclose(ub[0], u1, atol=1e-12)
        np.testing.assert_allclose(ub[1], u2, atol=1e-12)

    def test_spatial_alpha_map(self, rng):
        """α map: heavy smoothing half / zero half behaves accordingly."""
        _, f = noisy_image(rng, shape=(16, 16))
        amap = jnp.zeros((16, 16)).at[:, 8:].set(100.0)
        u = tv_denoise(f, amap, maxiter=6000)
        # zero-α half ≈ data
        np.testing.assert_allclose(u[:, :4], f[:, :4], atol=5e-3)
        # large-α half ≈ flat
        flat = u[:, 12:]
        assert float(flat.max() - flat.min()) < 5e-2

    def test_early_stop_matches_full(self, rng):
        _, f = noisy_image(rng)
        u_full = tv_denoise(f, 0.1, maxiter=6000)
        u_tol = tv_denoise(f, 0.1, maxiter=6000, tol=1e-10, check_every=250)
        np.testing.assert_allclose(u_tol, u_full, atol=1e-5)

    def test_unaccelerated_converges_to_same(self, rng):
        _, f = noisy_image(rng, shape=(16, 16))
        ua = tv_denoise(f, 0.1, maxiter=6000)
        un = tv_denoise(f, 0.1, maxiter=60000, accel=False)
        np.testing.assert_allclose(ua, un, atol=1e-4)


class TestSumRegs:
    def test_collapses_to_tv(self, rng):
        _, f = noisy_image(rng)
        u3 = sumregs_denoise(f, (0.1, 0.0, 0.0), maxiter=8000)
        u1 = tv_denoise(f, 0.1, maxiter=8000)
        np.testing.assert_allclose(u3, u1, atol=2e-4)

    def test_kkt_residual(self, rng):
        _, f = noisy_image(rng)
        model = sumregs_model()
        alphas = (0.05, 0.03, 0.02)
        u, ys, _ = denoise_pdps(f, alphas, model, maxiter=8000,
                                return_dual=True)
        recon = f
        for op, y in zip(model.ops, ys):
            recon = recon - op.apply_adjoint(y)
        assert float(jnp.abs(u - recon).max()) < 3e-4
        for y, a in zip(ys, alphas):
            assert float(xi(y).max()) <= a * (1 + 1e-8)

    def test_vector_alpha_form(self, rng):
        _, f = noisy_image(rng)
        u_t = sumregs_denoise(f, (0.05, 0.03, 0.02), maxiter=1000)
        u_v = sumregs_denoise(f, jnp.asarray([0.05, 0.03, 0.02]), maxiter=1000)
        np.testing.assert_allclose(u_t, u_v, atol=1e-12)

    def test_energy_decrease(self, rng):
        _, f = noisy_image(rng)
        model = sumregs_model()
        alphas = (0.05, 0.03, 0.02)
        u = denoise_pdps(f, alphas, model, maxiter=2000)
        assert float(model.energy(u, f, alphas)) < float(
            model.energy(f, f, alphas))
