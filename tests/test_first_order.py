"""Single-loop first-order bilevel learning tests (vs the TR oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.bilevel.first_order import (single_loop_learn,
                                                  single_loop_tv_learn)
from bpldenoising_tpu.learning import make_tv_learning_function
from bpldenoising_tpu.utils.config import Params


def small_ds(rng, n=24, O=2, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = np.stack([clean] * O)
    noisy = true_ + sigma * rng.standard_normal((O, n, n))
    return jnp.asarray(true_), jnp.asarray(noisy)


def test_converges_to_tr_solution(rng):
    utrue, f = small_ds(rng)
    res = single_loop_tv_learn(utrue, f, alpha0=0.01, outer=250,
                               n_inner=40, n_adj=10, lr=0.05)
    # TR oracle at full budgets
    lf = make_tv_learning_function(maxiter=4000)
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                    maxiter=15, tol=1e-6, verbose_iter=0)
    tr = bilevel_learn((utrue, f), lf, xinit=0.1, params=params)
    assert float(res.alpha) == pytest.approx(float(tr.x), rel=0.05)
    assert float(res.cost) == pytest.approx(tr.cost, rel=0.02)


def test_cost_trajectory_decreases(rng):
    utrue, f = small_ds(rng, O=1)
    res = single_loop_tv_learn(utrue, f, alpha0=0.005, outer=150,
                               n_inner=30, n_adj=8, lr=0.05)
    costs = np.asarray(res.cost_trajectory)
    # the tail is much better than the start (noisy per-step, so compare means)
    assert costs[-20:].mean() < costs[:20].mean()
    assert np.all(np.isfinite(costs))


def test_positivity_by_construction(rng):
    utrue, f = small_ds(rng, n=16, O=1)
    res = single_loop_tv_learn(utrue, f, alpha0=1e-4, outer=60,
                               n_inner=20, n_adj=5, lr=0.2)
    assert np.all(np.asarray(res.alpha_trajectory) > 0)


class TestGeneralizedSingleLoop:
    def test_patch_tv(self, rng):
        from bpldenoising_tpu.bilevel.first_order import single_loop_learn
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng, n=16, O=1)
        x0 = jnp.full((2, 2), 0.01)
        res = single_loop_learn(utrue, f, x0, tv_model(), outer=120,
                                n_inner=25, n_adj=6, lr=0.1)
        assert res.alpha.shape == (2, 2)
        assert np.all(np.asarray(res.alpha) > 0)
        costs = np.asarray(res.cost_trajectory)
        assert costs[-15:].mean() < costs[:15].mean()

    def test_sumregs_vector(self, rng):
        from bpldenoising_tpu.bilevel.first_order import (
            single_loop_sumregs_learn)
        utrue, f = small_ds(rng, n=16, O=1)
        res = single_loop_sumregs_learn(utrue, f, jnp.full(3, 0.005),
                                        outer=120, n_inner=25, n_adj=6,
                                        lr=0.1)
        assert res.alpha.shape == (3,)
        costs = np.asarray(res.cost_trajectory)
        assert costs[-15:].mean() < costs[:15].mean()

    def test_sumregs_patch(self, rng):
        from bpldenoising_tpu.bilevel.first_order import (
            single_loop_sumregs_learn)
        utrue, f = small_ds(rng, n=16, O=2)
        res = single_loop_sumregs_learn(utrue, f, jnp.full((2, 2, 3), 0.005),
                                        outer=80, n_inner=20, n_adj=5,
                                        lr=0.1)
        assert res.alpha.shape == (2, 2, 3)
        assert np.all(np.isfinite(np.asarray(res.cost_trajectory)))


class TestSegmentedTelemetry:
    """log_every chunked dispatch: identical trajectory, real wall-clock
    (VERDICT r3 #6 — single-loop runs previously logged zeroed telemetry)."""

    def test_matches_single_dispatch(self, rng):
        utrue, f = small_ds(rng, n=16, O=1)
        kw = dict(outer=30, n_inner=10, n_adj=4, lr=0.05)
        one = single_loop_tv_learn(utrue, f, alpha0=0.05, **kw)
        seg = single_loop_tv_learn(utrue, f, alpha0=0.05, log_every=7, **kw)
        # same scan body; segment boundaries only split the scan, so the
        # trajectories agree to float noise across executables
        np.testing.assert_allclose(np.asarray(seg.alpha_trajectory),
                                   np.asarray(one.alpha_trajectory),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(seg.cost_trajectory),
                                   np.asarray(one.cost_trajectory),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(seg.gnorm_trajectory),
                                   np.asarray(one.gnorm_trajectory),
                                   rtol=1e-8)
        times = np.asarray(seg.times)
        assert times.shape == (30,)
        # AOT-compiled executables: every segment-end time is real (> 0)
        # and cumulative times are monotone
        assert np.all(times > 0) and np.all(np.diff(times) >= 0)
        assert one.times is None

    def test_gnorm_trajectory_meaningful(self, rng):
        utrue, f = small_ds(rng, n=16, O=1)
        res = single_loop_tv_learn(utrue, f, alpha0=0.005, outer=100,
                                   n_inner=25, n_adj=6, lr=0.1)
        g = np.asarray(res.gnorm_trajectory)
        assert g.shape == (100,) and np.all(np.isfinite(g))
        # the hypergradient shrinks as the parameter approaches the valley
        assert g[-10:].mean() < g[:10].mean()

    def test_segmented_mesh(self, rng):
        import jax
        from jax.sharding import Mesh
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng, n=16, O=3)   # uneven batch over 2 shards
        mesh = Mesh(np.array(jax.devices()[:2]), ("batch",))
        kw = dict(outer=20, n_inner=8, n_adj=3, lr=0.05)
        plain = single_loop_learn(utrue, f, 0.05, tv_model(), **kw)
        seg = single_loop_learn(utrue, f, 0.05, tv_model(), mesh=mesh,
                                log_every=6, **kw)
        np.testing.assert_allclose(np.asarray(seg.alpha_trajectory),
                                   np.asarray(plain.alpha_trajectory),
                                   rtol=1e-6)
        assert seg.u.shape == utrue.shape
        times = np.asarray(seg.times)
        assert times.shape == (20,) and np.all(np.diff(times) >= 0)

    def test_segment_callback(self, rng):
        utrue, f = small_ds(rng, n=16, O=1)
        hops = []
        single_loop_tv_learn(utrue, f, alpha0=0.05, outer=10, n_inner=5,
                             n_adj=2, log_every=4,
                             segment_callback=lambda it, t: hops.append(
                                 (it, t)))
        assert [h[0] for h in hops] == [4, 8, 10]
        assert all(t > 0 for _, t in hops)


class TestOptaxIntegration:
    def test_optax_adam_matches_builtin(self, rng):
        """optax.adam with the built-in hyperparameters reproduces the
        hand-rolled Adam trajectory (same updates on log α)."""
        import optax
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng)
        kw = dict(outer=25, n_inner=10, n_adj=4)
        ref = single_loop_learn(utrue, f, 0.05, tv_model(), lr=0.05, **kw)
        opt = single_loop_learn(utrue, f, 0.05, tv_model(),
                                optimizer=optax.adam(0.05), **kw)
        np.testing.assert_allclose(float(opt.alpha), float(ref.alpha),
                                   rtol=1e-8)

    def test_optax_sgd_converges(self, rng):
        import optax
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng)
        res = single_loop_learn(utrue, f, 0.05, tv_model(),
                                optimizer=optax.sgd(0.02, momentum=0.9),
                                outer=60, n_inner=10, n_adj=4)
        assert np.isfinite(float(res.alpha)) and float(res.alpha) > 0
        costs = np.asarray(res.cost_trajectory)
        assert costs[-1] < costs[0]


def test_nonpositive_x0_rejected(rng):
    """log-space parameterization: zero/negative x0 silently degenerates,
    so every single-loop entry point rejects it up front."""
    import pytest
    from bpldenoising_tpu.bilevel.first_order import single_loop_learn
    from bpldenoising_tpu.bilevel.first_order_pallas import (
        single_loop_pallas, single_loop_pallas_tiled)
    from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
    from bpldenoising_tpu.models import tv_model
    from bpldenoising_tpu.utils.config import Params
    utrue = jnp.zeros((2, 8, 8))
    f = jnp.zeros((2, 8, 8))
    for bad in (0.0, -0.1, jnp.asarray([0.1, 0.0, 0.1])):
        with pytest.raises(ValueError, match="strictly positive"):
            single_loop_learn(utrue, f, bad, tv_model())
        with pytest.raises(ValueError, match="strictly positive"):
            single_loop_pallas(utrue, f, bad, tv_model(), interpret=True)
        with pytest.raises(ValueError, match="strictly positive"):
            single_loop_pallas_tiled(utrue, f, bad, tv_model(),
                                     interpret=True)
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                    delta0=0.1, maxiter=1, tol=1e-8, verbose_iter=0)
    with pytest.raises(ValueError, match="strictly positive"):
        bilevel_learn_fused((utrue, f), xinit=-0.1, params=params,
                            inner_maxiter=5, backend="jnp")
