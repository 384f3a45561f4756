"""Property/fuzz tests: random shapes, extreme parameters, dtype drift.

The reference has nothing of the sort; these pin the numerical robustness
envelope of the solver stack.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.ops import (
    BwdGradientOp,
    CenteredGradientOp,
    FwdGradientOp,
    PatchOp,
    proj_norm21_ball,
    xi,
)
from bpldenoising_tpu.solvers import denoise_pdps, tv_denoise
from bpldenoising_tpu.solvers.hypergrad import exact_hypergrad

OPS = [FwdGradientOp(), BwdGradientOp(), CenteredGradientOp()]


class TestRandomizedAdjoints:
    @pytest.mark.parametrize("trial", range(5))
    def test_random_shapes(self, trial):
        rng = np.random.default_rng(100 + trial)
        m = int(rng.integers(3, 40))
        n = int(rng.integers(3, 40))
        op = OPS[trial % 3]
        x = jnp.asarray(rng.standard_normal((m, n)))
        y = jnp.asarray(rng.standard_normal((2, m, n)))
        np.testing.assert_allclose(
            float(jnp.vdot(op.apply(x), y)),
            float(jnp.vdot(x, op.apply_adjoint(y))), rtol=1e-11)

    @pytest.mark.parametrize("trial", range(3))
    def test_patchop_random_blocks(self, trial):
        rng = np.random.default_rng(200 + trial)
        m = int(rng.integers(1, 6))
        n = int(rng.integers(1, 6))
        bm = int(rng.integers(1, 8))
        bn = int(rng.integers(1, 8))
        p = PatchOp((m, n), (m * bm, n * bn))
        x = jnp.asarray(rng.standard_normal((m, n)))
        y = jnp.asarray(rng.standard_normal((m * bm, n * bn)))
        np.testing.assert_allclose(
            float(jnp.vdot(p.apply(x), y)),
            float(jnp.vdot(x, p.apply_adjoint(y))), rtol=1e-11)


class TestSolverRobustness:
    def test_tiny_image(self, rng):
        f = jnp.asarray(rng.standard_normal((3, 3)))
        u = tv_denoise(f, 0.1, maxiter=2000)
        assert np.all(np.isfinite(np.asarray(u)))

    def test_extreme_alphas(self, rng):
        f = jnp.asarray(rng.uniform(0, 1, (16, 16)))
        for a in [1e-12, 1e-6, 1e6]:
            u = tv_denoise(f, a, maxiter=500)
            assert np.all(np.isfinite(np.asarray(u))), f"alpha={a}"

    def test_constant_input(self):
        f = jnp.full((16, 16), 0.5)
        u = tv_denoise(f, 0.3, maxiter=1000)
        np.testing.assert_allclose(np.asarray(u), 0.5, atol=1e-10)

    def test_f32_f64_drift_bounded(self, rng):
        f64 = jnp.asarray(rng.uniform(0, 1, (24, 24)))
        u64 = tv_denoise(f64, 0.1, maxiter=3000)
        u32 = tv_denoise(f64.astype(jnp.float32), jnp.float32(0.1),
                         maxiter=3000)
        assert float(jnp.abs(u64 - u32.astype(jnp.float64)).max()) < 1e-4

    def test_projection_idempotent(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 12, 12))) * 5
        q1 = proj_norm21_ball(p, 0.3)
        q2 = proj_norm21_ball(q1, 0.3)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                                   atol=1e-12)

    def test_hypergrad_flat_image(self, rng):
        """All-active (fully flat) u must not produce NaNs."""
        u = jnp.full((12, 12), 0.4)
        utrue = jnp.asarray(rng.uniform(0, 1, (12, 12)))
        (g,), _, _ = exact_hypergrad(u, utrue, (jnp.asarray(0.1),),
                                     tv_model())
        assert np.isfinite(float(g))

    def test_sumregs_zero_alpha_components(self, rng):
        f = jnp.asarray(rng.uniform(0, 1, (16, 16)))
        u = denoise_pdps(f, (0.1, 0.0, 0.0), sumregs_model(), maxiter=2000)
        assert np.all(np.isfinite(np.asarray(u)))


class TestEnergyProperties:
    def test_energy_monotone_in_alpha_at_solution(self, rng):
        """J_data(u*(α)) = ½‖u*−f‖² grows with α (more smoothing)."""
        f = jnp.asarray(rng.uniform(0, 1, (16, 16)))
        dists = []
        for a in [0.02, 0.08, 0.3]:
            u = tv_denoise(f, a, maxiter=4000)
            dists.append(float(jnp.sum((u - f) ** 2)))
        assert dists[0] < dists[1] < dists[2]

    def test_tv_decreases_with_alpha(self, rng):
        from bpldenoising_tpu.ops import norm21
        f = jnp.asarray(rng.uniform(0, 1, (16, 16)))
        op = FwdGradientOp()
        tvs = []
        for a in [0.02, 0.08, 0.3]:
            u = tv_denoise(f, a, maxiter=4000)
            tvs.append(float(norm21(op.apply(u))))
        assert tvs[0] > tvs[1] > tvs[2]


class TestTGVImplementationConsistency:
    """Fuzz: the three TGV inner-solver implementations (jnp stencils,
    fused kernel in interpret mode, row-sharded halo solver) agree on
    random shapes, batches and weight forms."""

    @pytest.mark.parametrize("trial", range(3))
    def test_random_problems(self, trial):
        import jax
        from jax.sharding import Mesh
        from bpldenoising_tpu.parallel.halo import (
            ROWS_AXIS, tgv_denoise_pdps_row_sharded)
        from bpldenoising_tpu.solvers.tgv import tgv_denoise_pdps
        from bpldenoising_tpu.solvers.tgv_pallas import (
            tgv_denoise_pdps_pallas)

        rng = np.random.default_rng(100 + trial)
        O = int(rng.integers(1, 4))
        M = int(rng.choice([16, 24, 32]))
        N = int(rng.choice([16, 24]))
        f = jnp.asarray(rng.standard_normal((O, M, N)))
        if trial % 2:
            a1 = jnp.asarray(rng.uniform(0.05, 0.3, (M, N)))
            a0 = float(rng.uniform(0.05, 0.3))
        else:
            a1 = float(rng.uniform(0.05, 0.3))
            a0 = float(rng.uniform(0.05, 0.3))
        it = 150
        u_ref, w_ref = tgv_denoise_pdps(f, a1, a0, maxiter=it)
        u_k, w_k = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=it,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref),
                                   atol=1e-12)
        n_sh = 4 if M % 4 == 0 else 2
        mesh = Mesh(np.array(jax.devices()[:n_sh]), (ROWS_AXIS,))
        u_h, w_h = tgv_denoise_pdps_row_sharded(f[0], a1, a0, mesh,
                                                maxiter=it)
        np.testing.assert_allclose(np.asarray(u_h), np.asarray(u_ref[0]),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(w_h), np.asarray(w_ref[0]),
                                   atol=1e-10)
