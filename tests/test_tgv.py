"""TGV² (beyond-reference model family) tests: symmetrized-gradient adjoint
and operator-norm identities, PDPS solver properties (energy descent,
piecewise-affine recovery, batching, warm start, early stop), implicit-diff
gradients vs finite differences, the L4 learning-function contract, and the
experiment front-ends' artifacts."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.ops import FwdGradientOp
from bpldenoising_tpu.ops.tgv import (TGV_OPNORM_SQ, SymGradientOp, sym_div,
                                      sym_grad)
from bpldenoising_tpu.solvers.tgv import (diff_tgv_denoise, tgv_denoise_pdps,
                                          tgv_energy)


def ramp_problem(rng, n=32, sigma=0.1):
    """Noisy piecewise-affine (single ramp) image — TGV's home turf."""
    clean = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n), (n, n))
    noisy = clean + sigma * jnp.asarray(rng.standard_normal((n, n)))
    return clean, noisy


class TestSymGradientOp:
    def test_adjoint_identity(self, rng):
        w = jnp.asarray(rng.standard_normal((2, 9, 7)))
        z = jnp.asarray(rng.standard_normal((3, 9, 7)))
        lhs = float(jnp.sum(sym_grad(w) * z))
        rhs = float(jnp.sum(w * sym_div(z)))
        assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))

    def test_dense_matrix_adjoint(self):
        op = SymGradientOp()
        A = op.as_matrix((2, 5, 4), dtype=jnp.float64)
        At = op.T.as_matrix((3, 5, 4), dtype=jnp.float64)
        np.testing.assert_allclose(A.T, At, atol=1e-12)

    def test_opnorm_bound(self, rng):
        op = SymGradientOp()
        est = op.opnorm_estimate(jnp.asarray(rng.standard_normal((2, 16, 16))))
        assert est <= op.opnorm_bound() + 1e-6
        assert est > 0.8 * op.opnorm_bound()  # bound is tight-ish

    def test_joint_tgv_opnorm(self, rng):
        """Power method on K(u,w) = (∇u − w, E w): ‖K‖² ≤ 12."""
        grad = FwdGradientOp()

        def K(u, w):
            return grad.apply(u) - w, sym_grad(w)

        def KT(p, q):
            return grad.apply_adjoint(p), -p + sym_div(q)

        u = jnp.asarray(rng.standard_normal((24, 24)))
        w = jnp.asarray(rng.standard_normal((2, 24, 24)))
        for _ in range(100):
            p, q = K(u, w)
            u, w = KT(p, q)
            nrm = math.sqrt(float(jnp.sum(u**2) + jnp.sum(w**2)))
            u, w = u / nrm, w / nrm
        p, q = K(u, w)
        lam = float(jnp.sum(p**2) + jnp.sum(q**2))  # Rayleigh ‖K x‖²/‖x‖²
        assert lam <= TGV_OPNORM_SQ + 1e-6
        assert lam > 0.75 * TGV_OPNORM_SQ

    def test_frobenius_weighting(self, rng):
        """|E w|² per pixel = E_rr² + E_cc² + 2 E_rc² (√2 off-diag store)."""
        from bpldenoising_tpu.ops.grad import dminus
        w = jnp.asarray(rng.standard_normal((2, 8, 8)))
        e = sym_grad(w)
        err = dminus(w[0], -2)
        ecc = dminus(w[1], -1)
        erc = 0.5 * (dminus(w[0], -1) + dminus(w[1], -2))
        frob = err**2 + ecc**2 + 2.0 * erc**2
        np.testing.assert_allclose(np.asarray(jnp.sum(e**2, axis=0)),
                                   np.asarray(frob), atol=1e-12)


class TestTGVSolver:
    def test_energy_descent_and_optimality(self, rng):
        _, f = ramp_problem(rng)
        u, w = tgv_denoise_pdps(f, 0.15, 0.3, maxiter=3000)
        e_init = float(tgv_energy(f, f, jnp.zeros((2,) + f.shape), 0.15, 0.3))
        e_final = float(tgv_energy(f, u, w, 0.15, 0.3))
        assert e_final < e_init
        # perturbing the solution raises the energy (local optimality)
        du = 1e-2 * jnp.asarray(rng.standard_normal(f.shape))
        dw = 1e-2 * jnp.asarray(rng.standard_normal((2,) + f.shape))
        assert float(tgv_energy(f, u + du, w + dw, 0.15, 0.3)) > e_final
        assert float(tgv_energy(f, u - du, w - dw, 0.15, 0.3)) > e_final

    def test_affine_recovery_beats_tv(self, rng):
        """On a noisy ramp, TGV reconstructs the affine image much better
        than the noise floor and better than TV at its best (staircasing)."""
        from bpldenoising_tpu.solvers import tv_denoise
        clean, f = ramp_problem(rng, n=32, sigma=0.1)
        u_tgv, _ = tgv_denoise_pdps(f, 0.12, 0.24, maxiter=4000)
        err_tgv = float(jnp.sqrt(jnp.mean((u_tgv - clean) ** 2)))
        err_noisy = float(jnp.sqrt(jnp.mean((f - clean) ** 2)))
        errs_tv = []
        for a in (0.03, 0.06, 0.12, 0.24):
            u_tv = tv_denoise(f, a, maxiter=4000)
            errs_tv.append(float(jnp.sqrt(jnp.mean((u_tv - clean) ** 2))))
        assert err_tgv < 0.45 * err_noisy
        assert err_tgv < min(errs_tv)

    def test_batched_matches_per_image(self, rng):
        f = jnp.asarray(rng.standard_normal((3, 16, 16)))
        u_b, w_b = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=400)
        for i in range(3):
            u_i, w_i = tgv_denoise_pdps(f[i], 0.1, 0.2, maxiter=400)
            np.testing.assert_allclose(np.asarray(u_b[i]), np.asarray(u_i),
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(w_b[i]), np.asarray(w_i),
                                       atol=1e-12)

    def test_warm_start_resumes(self, rng):
        _, f = ramp_problem(rng, n=16)
        u_full, w_full = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=800)
        out = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=400, return_state=True)
        _, _, state, iters = out
        assert int(iters) == 400
        u_res, w_res = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=400,
                                        state0=state)
        np.testing.assert_allclose(np.asarray(u_res), np.asarray(u_full),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(w_res), np.asarray(w_full),
                                   atol=1e-12)

    def test_early_stop(self, rng):
        _, f = ramp_problem(rng, n=16)
        u_ref, _ = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=6000)
        u_es, _, _, iters = tgv_denoise_pdps(
            f, 0.1, 0.2, maxiter=6000, tol=1e-4, check_every=200,
            return_state=True)
        assert int(iters) < 6000
        np.testing.assert_allclose(np.asarray(u_es), np.asarray(u_ref),
                                   atol=5e-3)


class TestDiffTGV:
    def test_grad_matches_fd(self, rng):
        utrue, f = ramp_problem(rng, n=12)

        def loss(a):
            u = diff_tgv_denoise(f, a[0], a[1], maxiter=3000)
            return 0.5 * jnp.sum((u - utrue) ** 2)

        a = jnp.asarray([0.1, 0.2])
        g = np.asarray(jax.grad(loss)(a))
        eps = 1e-4
        for k in range(2):
            e = jnp.zeros(2).at[k].set(eps)
            fd = (float(loss(a + e)) - float(loss(a - e))) / (2 * eps)
            assert abs(g[k] - fd) < 3e-2 * max(1.0, abs(fd)), (k, g[k], fd)

    def test_grad_f(self, rng):
        utrue, f = ramp_problem(rng, n=10)

        def loss(f_):
            u = diff_tgv_denoise(f_, 0.1, 0.2, maxiter=2000)
            return 0.5 * jnp.sum((u - utrue) ** 2)

        g = np.asarray(jax.grad(loss)(f))
        rng2 = np.random.default_rng(1)
        d = jnp.asarray(rng2.standard_normal(f.shape))
        eps = 1e-5
        fd = (float(loss(f + eps * d)) - float(loss(f - eps * d))) / (2 * eps)
        assert abs(float(jnp.sum(g * d)) - fd) < 2e-2 * max(1.0, abs(fd))


class TestTGVLearning:
    def test_contract_and_fd(self, rng):
        from bpldenoising_tpu.learning import tgv_learning_function
        utrue, f = ramp_problem(rng, n=12)
        ds = (utrue[None], f[None])
        x = np.array([0.1, 0.2])
        u, cost, grad = tgv_learning_function(x, ds, 0.01, maxiter=2000)
        assert u.shape == (1, 12, 12)
        assert grad.shape == (2,)
        eps = 1e-4
        for k in range(2):
            e = np.zeros(2)
            e[k] = eps
            _, cp, _ = tgv_learning_function(x + e, ds, 0.01, maxiter=2000)
            _, cm, _ = tgv_learning_function(x - e, ds, 0.01, maxiter=2000)
            fd = (float(cp) - float(cm)) / (2 * eps)
            assert abs(float(grad[k]) - fd) < 5e-2 * max(1.0, abs(fd))

    def test_rejects_bad_shape(self, rng):
        from bpldenoising_tpu.learning import tgv_learning_function
        utrue, f = ramp_problem(rng, n=8)
        with pytest.raises(ValueError):
            tgv_learning_function(np.array([0.1]), (utrue, f), 0.01,
                                  maxiter=10)


class TestTGVExperiments:
    @pytest.fixture(autouse=True)
    def out_in_tmpdir(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        yield tmp_path

    FAST = dict(inner_maxiter=200, maxiter=3, dataset_name="circle",
                num_samples=1)

    def test_scalar_tgv_learn(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tgv_learn
        res = scalar_bilevel_tgv_learn(alpha0=np.array([0.05, 0.05]),
                                       **self.FAST)
        assert res.x.shape == (2,)
        assert np.all(np.asarray(res.x) > 0)
        d = os.path.join("output", "circle_128_10")
        files = sorted(os.listdir(d))
        assert any(f.endswith("_quality.txt") for f in files)
        assert any("reco" in f for f in files)

    def test_tgv_single_loop_front_end(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tgv_learn
        res = scalar_bilevel_tgv_learn(method="single_loop", sl_outer=20,
                                       sl_inner=20, sl_adj=5, **self.FAST)
        assert res.x.shape == (2,)
        assert np.all(np.asarray(res.x) > 0)

    def test_validate_tgv(self):
        from bpldenoising_tpu.experiments import validate_tgv_parameter
        out = validate_tgv_parameter(np.array([0.08, 0.16]),
                                     dataset_name="circle",
                                     inner_maxiter=300)
        assert out["cost"] > 0
        assert out["mean_psnr"] > 0

    def test_tgv_denoise_front_end(self, rng):
        from bpldenoising_tpu.experiments import TGVDenoise
        f = np.asarray(rng.standard_normal((2, 16, 16)))
        u = TGVDenoise(f, [0.1, 0.2], maxiter=300)
        assert np.asarray(u).shape == (2, 16, 16)
        with pytest.raises(ValueError):
            TGVDenoise(f, [0.1, 0.2, 0.3], maxiter=10)

    def test_tgv_denoise_patch_parameter(self, rng):
        """(m, n, 2) patch grids upsample to per-pixel weight maps (the
        patch form of ref TVDenoise, src/BPLDenoising.jl:61-82); a
        constant grid must reproduce the scalar pair."""
        from bpldenoising_tpu.experiments import TGVDenoise
        f = np.asarray(rng.standard_normal((1, 16, 16)))
        grids = np.stack([np.full((2, 2), 0.1), np.full((2, 2), 0.2)],
                         axis=-1)
        u_p = TGVDenoise(f, grids, maxiter=300, backend="jnp")
        u_s = TGVDenoise(f, [0.1, 0.2], maxiter=300, backend="jnp")
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_s),
                                   atol=1e-12)
        # validate front-end accepts the patch form too
        from bpldenoising_tpu.experiments import validate_tgv_parameter
        out = validate_tgv_parameter(grids, dataset_name="circle",
                                     inner_maxiter=200, backend="jnp")
        assert out["mean_psnr"] > 0


class TestMapAlphaTGV:
    """Spatially-varying (map/patch) TGV weights."""

    def test_map_matches_scalar_when_constant(self, rng):
        from bpldenoising_tpu.solvers.tgv import tgv_denoise_pdps
        _, f = ramp_problem(rng, n=16)
        u_s, w_s = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=400)
        a1 = jnp.full((16, 16), 0.1)
        a0 = jnp.full((16, 16), 0.2)
        u_m, w_m = tgv_denoise_pdps(f, a1, a0, maxiter=400)
        np.testing.assert_allclose(np.asarray(u_m), np.asarray(u_s),
                                   atol=1e-12)

    def test_energy_map_matches_scalar(self, rng):
        from bpldenoising_tpu.solvers.tgv import tgv_energy
        _, f = ramp_problem(rng, n=12)
        w = jnp.asarray(rng.standard_normal((2, 12, 12)))
        e_s = float(tgv_energy(f, f, w, 0.1, 0.2))
        e_m = float(tgv_energy(f, f, w, jnp.full((12, 12), 0.1),
                               jnp.full((12, 12), 0.2)))
        np.testing.assert_allclose(e_m, e_s, rtol=1e-12)

    def test_patch_grad_matches_fd(self, rng):
        from bpldenoising_tpu.learning import tgv_learning_function
        utrue, f = ramp_problem(rng, n=12)
        ds = (utrue[None], f[None])
        x = 0.1 * np.ones((2, 2, 2))
        x[..., 1] = 0.2
        u, cost, grad = tgv_learning_function(x, ds, 0.01, maxiter=1500)
        assert grad.shape == (2, 2, 2)
        eps = 1e-4
        for idx in [(0, 0, 0), (1, 1, 1), (0, 1, 0)]:
            e = np.zeros((2, 2, 2))
            e[idx] = eps
            _, cp, _ = tgv_learning_function(x + e, ds, 0.01, maxiter=1500)
            _, cm, _ = tgv_learning_function(x - e, ds, 0.01, maxiter=1500)
            fd = (float(cp) - float(cm)) / (2 * eps)
            assert abs(float(grad[idx]) - fd) < 5e-2 * max(1.0, abs(fd)), \
                (idx, float(grad[idx]), fd)

    def test_patch_learn_experiment(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from bpldenoising_tpu.experiments import patch_bilevel_tgv_learn
        res = patch_bilevel_tgv_learn(
            inner_maxiter=200, maxiter=3, dataset_name="circle",
            num_samples=1)
        assert res.x.shape == (2, 2, 2)
        d = os.path.join("output", "circle_128_10")
        files = sorted(os.listdir(d))
        assert sum("_par_" in f for f in files) == 2   # two stretched maps

    def test_cost_sweep_and_plot(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from bpldenoising_tpu.experiments import (generate_tgv_cost,
                                                  generate_tgv_cost_plot)
        c = generate_tgv_cost("circle", np.logspace(-2, -1, 3),
                              np.logspace(-2, -1, 3), maxiter=100)
        assert c.shape == (3, 3) and np.all(np.isfinite(c))
        base = generate_tgv_cost_plot("circle")
        assert os.path.exists(base + ".png")


class TestTGVWarmStart:
    def test_factory_chains_state_with_tol(self, rng):
        """With an early-stop tol the factory warm-starts evaluation k+1
        from evaluation k's solver state; gradients at nearby α must agree
        with cold evaluations to solver precision."""
        from bpldenoising_tpu.learning import (make_tgv_learning_function,
                                               tgv_learning_function)
        utrue, f = ramp_problem(rng, n=16)
        ds = (utrue[None], f[None])
        lf = make_tgv_learning_function(maxiter=8000, tol=1e-7,
                                        check_every=100)
        xs = [np.array([0.1, 0.2]), np.array([0.105, 0.2]),
              np.array([0.1, 0.21])]
        for x in xs:
            _, c_w, g_w = lf(x, ds, 0.01)
            _, c_c, g_c = tgv_learning_function(x, ds, 0.01, maxiter=8000,
                                                tol=1e-7, check_every=100)
            # warm and cold stop at slightly different points of the
            # O(1/k) tail; measured agreement ~0.1% cost / ~1% grad
            np.testing.assert_allclose(float(c_w), float(c_c), rtol=5e-3)
            np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_c),
                                       rtol=5e-2)

    def test_no_tol_no_chaining(self, rng):
        """Fixed-budget (no tol) evaluations stay cold — bit-identical
        across repeat calls at the same α."""
        from bpldenoising_tpu.learning import make_tgv_learning_function
        utrue, f = ramp_problem(rng, n=12)
        ds = (utrue[None], f[None])
        lf = make_tgv_learning_function(maxiter=300)
        _, c1, g1 = lf(np.array([0.1, 0.2]), ds, 0.01)
        _, c2, g2 = lf(np.array([0.1, 0.2]), ds, 0.01)
        assert float(c1) == float(c2)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
