"""End-to-end learning-function and bilevel tests on small problems
(SURVEY.md §4: "golden end-to-end runs on circle_128_10")."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.learning import (
    make_sumregs_learning_function,
    make_tv_learning_function,
    sumregs_learning_function,
    tv_learning_function,
)
from bpldenoising_tpu.data import testdataset as load_testdataset
from bpldenoising_tpu.utils.config import Params


def small_ds(rng, n=24, O=2, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = np.stack([clean] * O)
    noisy = true_ + sigma * rng.standard_normal((O, n, n))
    return jnp.asarray(true_), jnp.asarray(noisy)


def tr_params(**kw):
    base = dict(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                maxiter=10, tol=1e-5, verbose_iter=0)
    base.update(kw)
    return Params(**base)


class TestLearningFunctionContract:
    def test_scalar_shapes(self, rng):
        ds = small_ds(rng)
        u, cost, grad = tv_learning_function(0.1, ds, 0.1, maxiter=500)
        assert u.shape == ds[0].shape
        assert np.ndim(cost) == 0
        assert np.shape(grad) == ()

    def test_patch_shapes(self, rng):
        ds = small_ds(rng)
        x = jnp.full((2, 2), 0.1)
        u, cost, grad = tv_learning_function(x, ds, 0.1, maxiter=500)
        assert grad.shape == (2, 2)

    def test_sumregs_vector_shapes(self, rng):
        ds = small_ds(rng)
        x = jnp.asarray([0.05, 0.03, 0.02])
        u, cost, grad = sumregs_learning_function(x, ds, 0.1, maxiter=500)
        assert grad.shape == (3,)

    def test_sumregs_patch_shapes(self, rng):
        ds = small_ds(rng)
        x = jnp.full((2, 2, 3), 0.05)
        u, cost, grad = sumregs_learning_function(x, ds, 0.1, maxiter=500)
        assert grad.shape == (2, 2, 3)

    def test_reg_branch_selected_below_delta_t(self, rng):
        ds = small_ds(rng)
        # both branches must run and produce close gradients
        _, _, g_exact = tv_learning_function(0.1, ds, 1.0, maxiter=2000)
        _, _, g_reg = tv_learning_function(0.1, ds, 1e-8, maxiter=2000)
        np.testing.assert_allclose(float(g_exact), float(g_reg), rtol=5e-2)

    def test_batch_grad_is_sum_of_singles(self, rng):
        """The batch gradient is the sum of per-image gradients.  The batch
        is solved as ONE joint block-diagonal CG system, so the identity is
        exact only at CG convergence — use a converged configuration."""
        from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
        cfg = HypergradConfig(cg_tol=1e-13, cg_maxiter=20000, al_iters=6)
        ds = small_ds(rng, O=2)
        _, _, g_all = tv_learning_function(0.1, ds, 0.1, maxiter=5000,
                                           cfg=cfg)
        g_sum = 0.0
        for i in range(2):
            dsi = (ds[0][i:i + 1], ds[1][i:i + 1])
            _, _, gi = tv_learning_function(0.1, dsi, 0.1, maxiter=5000,
                                            cfg=cfg)
            g_sum += float(gi)
        np.testing.assert_allclose(float(g_all), g_sum, rtol=1e-7)


class TestBilevelEndToEnd:
    def test_scalar_tv_learn_synthetic(self, rng):
        """Learned α must beat both endpoints of the cost landscape."""
        ds = small_ds(rng, n=24, O=1)
        lf = make_tv_learning_function(maxiter=1000)
        res = bilevel_learn(ds, lf, xinit=0.1,
                            params=tr_params(maxiter=12, delta0=0.1))
        alpha = float(res.x)
        assert 1e-4 < alpha < 1.0
        # cost at learned alpha below costs at perturbed alphas
        _, c_opt, _ = lf(alpha, ds, 0.1)
        _, c_lo, _ = lf(alpha * 0.25, ds, 0.1)
        _, c_hi, _ = lf(alpha * 4.0, ds, 0.1)
        assert float(c_opt) <= float(c_lo)
        assert float(c_opt) <= float(c_hi)

    def test_scalar_tv_learn_circle_dataset(self):
        """Golden run on the bundled circle_128_10 dataset (reduced budget)."""
        true_, noisy = load_testdataset("circle")
        ds = (jnp.asarray(true_), jnp.asarray(noisy))
        lf = make_tv_learning_function(maxiter=1500)
        res = bilevel_learn(ds, lf, xinit=0.1,
                            params=tr_params(maxiter=8, delta0=0.1))
        baseline_cost = 0.5 * float(np.sum((noisy - true_) ** 2))
        assert res.cost < baseline_cost  # denoising helps
        assert 1e-3 < float(res.x) < 1.0

    def test_sumregs_learn_synthetic(self, rng):
        ds = small_ds(rng, n=16, O=1)
        lf = make_sumregs_learning_function(maxiter=800)
        x0 = np.array([0.001, 0.001, 0.001])
        res = bilevel_learn(ds, lf, xinit=x0,
                            params=tr_params(maxiter=8, delta0=0.01))
        assert np.all(res.x > 0)
        _, c0, _ = lf(x0, ds, 0.1)
        assert res.cost <= float(c0)
