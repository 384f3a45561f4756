"""TV-L1 method matrix: fused one-dispatch trust region, single-loop
first-order learner, and the Huber-smoothed Pallas kernel — parity against
the host TR loop and the jnp solver (VERDICT r3 item 1: the family's
method matrix must match every other family's)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import (bilevel_learn, bilevel_learn_tvl1_fused,
                                      single_loop_tvl1_learn)
from bpldenoising_tpu.data import add_impulse_noise, circle_phantom
from bpldenoising_tpu.learning.tvl1 import make_tvl1_learning_function
from bpldenoising_tpu.solvers.tvl1_huber import tvl1_huber_denoise
from bpldenoising_tpu.solvers.tvl1_huber_pallas import \
    tvl1_huber_denoise_pallas
from bpldenoising_tpu.utils.config import Params

GD, GR = 100.0, 1000.0
PARAMS = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                maxiter=6, tol=1e-10, verbose_iter=100)
INNER = 400


@pytest.fixture(scope="module")
def sp():
    clean = jnp.asarray(circle_phantom(24), jnp.float64)
    noisy = jnp.asarray(add_impulse_noise(np.asarray(clean), 0.2, 0),
                        jnp.float64)
    return (clean[None], noisy[None])


@pytest.fixture(scope="module")
def sp4():
    clean = jnp.asarray(circle_phantom(24), jnp.float64)
    ts, ns = [], []
    for i in range(4):
        ts.append(np.asarray(clean))
        ns.append(add_impulse_noise(np.asarray(clean), 0.2, i))
    return (jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(ns)))


# ---------------------------------------------------------------------------
# Huber-smoothed Pallas kernel vs the jnp oracle
# ---------------------------------------------------------------------------

class TestHuberPallasKernel:
    def test_matches_jnp_scalar(self, sp):
        _, noisy = sp
        u_j = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                 maxiter=300)
        u_p = tvl1_huber_denoise_pallas(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                        maxiter=300, interpret=True)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_j),
                                   atol=1e-10)

    def test_matches_jnp_map(self, sp):
        _, noisy = sp
        M, N = noisy.shape[-2:]
        amap = jnp.asarray(0.5 + 0.4 * np.random.default_rng(1).random(
            (M, N)), noisy.dtype)
        u_j = tvl1_huber_denoise(noisy, amap, gamma_d=GD, gamma_r=GR,
                                 maxiter=300)
        u_p = tvl1_huber_denoise_pallas(noisy, amap, gamma_d=GD,
                                        gamma_r=GR, maxiter=300,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_j),
                                   atol=1e-10)

    def test_warm_state_continuation(self, sp):
        """300 + 300 warm-chained iterations equal 600 straight (same
        contract as the plain TV-L1 kernel)."""
        _, noisy = sp
        u1, st = tvl1_huber_denoise_pallas(noisy, 0.8, gamma_d=GD,
                                           gamma_r=GR, maxiter=300,
                                           return_dual=True,
                                           interpret=True)
        u2 = tvl1_huber_denoise_pallas(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                       maxiter=300, state0=st,
                                       interpret=True)
        u_long = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                    maxiter=600)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u_long),
                                   atol=1e-10)

    def test_early_stop(self, sp):
        _, noisy = sp
        u_tol = tvl1_huber_denoise_pallas(noisy, 0.8, gamma_d=GD,
                                          gamma_r=GR, maxiter=5000,
                                          tol=1e-7, check_every=100,
                                          interpret=True)
        u_ref = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                   maxiter=5000, tol=1e-7, check_every=100)
        np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_ref),
                                   atol=1e-10)


# ---------------------------------------------------------------------------
# Fused one-dispatch trust region vs the host loop
# ---------------------------------------------------------------------------

class TestFusedTVL1:
    def test_parity_matches_host_loop(self, sp):
        """inner_tol=None + the shared tvl1_huber_hypergrad (joint CG, same
        warm-start discipline) makes every fused evaluation the same
        computation as the host learning function."""
        ds = sp
        lf = make_tvl1_learning_function(gamma_d=GD, gamma=GR,
                                         maxiter=INNER)
        host = bilevel_learn(ds, lf, xinit=0.3, params=PARAMS)
        fused = bilevel_learn_tvl1_fused(ds, xinit=0.3, params=PARAMS,
                                         inner_maxiter=INNER,
                                         inner_tol=None, gamma_d=GD,
                                         gamma=GR, backend="jnp")
        np.testing.assert_allclose(float(fused.x), float(host.x),
                                   rtol=1e-6)
        assert abs(float(fused.cost) - float(host.cost)) <= \
            1e-6 * max(1.0, float(host.cost))
        assert float(fused.x) > 0

    def test_patch_parity_matches_host_loop(self, sp):
        x0 = 0.3 * np.ones((2, 2))
        lf = make_tvl1_learning_function(gamma_d=GD, gamma=GR,
                                         maxiter=INNER)
        host = bilevel_learn(sp, lf, xinit=x0, params=PARAMS)
        fused = bilevel_learn_tvl1_fused(sp, xinit=x0, params=PARAMS,
                                         inner_maxiter=INNER,
                                         inner_tol=None, gamma_d=GD,
                                         gamma=GR, backend="jnp")
        np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                                   rtol=1e-6)

    def test_warm_mode_lands_in_same_valley(self, sp):
        cold = bilevel_learn_tvl1_fused(sp, xinit=0.3, params=PARAMS,
                                        inner_maxiter=2000, inner_tol=None,
                                        gamma_d=GD, gamma=GR,
                                        backend="jnp")
        warm = bilevel_learn_tvl1_fused(sp, xinit=0.3, params=PARAMS,
                                        inner_maxiter=2000, inner_tol=1e-7,
                                        check_every=100, gamma_d=GD,
                                        gamma=GR, backend="jnp")
        np.testing.assert_allclose(float(warm.x), float(cold.x), rtol=5e-2)

    def test_segmented_matches_single_dispatch(self, sp):
        one = bilevel_learn_tvl1_fused(sp, xinit=0.3, params=PARAMS,
                                       inner_maxiter=INNER, inner_tol=None,
                                       gamma_d=GD, gamma=GR, backend="jnp")
        seg = bilevel_learn_tvl1_fused(sp, xinit=0.3, params=PARAMS,
                                       inner_maxiter=INNER, inner_tol=None,
                                       gamma_d=GD, gamma=GR, backend="jnp",
                                       log_every=2)
        assert int(seg.iterations) == int(one.iterations)
        # same while-loop body, but init+loop fuse into ONE executable in
        # single-dispatch mode vs separate init/segment executables here —
        # XLA may reassociate reductions across that boundary, so equality
        # holds to float noise, not bitwise
        np.testing.assert_allclose(np.asarray(seg.x), np.asarray(one.x),
                                   rtol=1e-9)
        seg_log, one_log = np.asarray(seg.log), np.asarray(one.log)
        np.testing.assert_allclose(seg_log[:, :4], one_log[:, :4],
                                   rtol=1e-6, atol=1e-12)
        # the adjoint-CG iteration count (col 4) is a DISCRETE counter on a
        # residual threshold — float noise at the threshold flips it by ±1
        np.testing.assert_allclose(seg_log[:, 4], one_log[:, 4], atol=1)
        np.testing.assert_array_equal(seg_log[:, 5], one_log[:, 5])
        times = np.asarray(seg.times)
        assert times.shape == (int(seg.iterations),)
        assert np.all(times > 0) and np.all(np.diff(times) >= 0)

    def test_mesh_matches_single_device(self, sp4):
        """Batch sharded over 4 devices (psum'd cost/gradient; per-shard
        joint CG differs only within the adjoint tolerance) — including a
        zero-padded uneven batch."""
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
        kw = dict(xinit=0.3, params=PARAMS | dict(maxiter=4),
                  inner_maxiter=INNER, inner_tol=None, gamma_d=GD,
                  gamma=GR, backend="jnp")
        one = bilevel_learn_tvl1_fused(sp4, **kw)
        par = bilevel_learn_tvl1_fused(sp4, mesh=mesh, **kw)
        np.testing.assert_allclose(float(par.x), float(one.x), rtol=2e-4)
        assert par.u.shape == sp4[0].shape
        ds3 = (sp4[0][:3], sp4[1][:3])
        one3 = bilevel_learn_tvl1_fused(ds3, **kw)
        par3 = bilevel_learn_tvl1_fused(ds3, mesh=mesh, **kw)
        np.testing.assert_allclose(float(par3.x), float(one3.x), rtol=2e-4)
        assert par3.u.shape == ds3[0].shape

    def test_pallas_backend_interpret(self, sp):
        """The fused TR loop on the Huber-smoothed kernel (interpret mode)
        matches the jnp backend."""
        kw = dict(xinit=0.3, params=PARAMS | dict(maxiter=3),
                  inner_maxiter=200, inner_tol=None, gamma_d=GD, gamma=GR)
        a = bilevel_learn_tvl1_fused(sp, backend="jnp", **kw)
        b = bilevel_learn_tvl1_fused(sp, backend="pallas", interpret=True,
                                     **kw)
        np.testing.assert_allclose(float(b.x), float(a.x), rtol=1e-6)

    def test_rejects_bad_param_shape(self, sp):
        with pytest.raises(ValueError, match="scalar or an"):
            bilevel_learn_tvl1_fused(sp, xinit=np.ones((2, 2, 2)),
                                     params=PARAMS, backend="jnp")


# ---------------------------------------------------------------------------
# Single-loop first-order learner
# ---------------------------------------------------------------------------

class TestSingleLoopTVL1:
    def test_lands_in_tr_valley(self, sp):
        """The single-loop learner reaches the trust-region minimizer's
        neighborhood with an order of magnitude less PD work."""
        tr = bilevel_learn_tvl1_fused(sp, xinit=0.3, params=PARAMS,
                                      inner_maxiter=2000, inner_tol=None,
                                      gamma_d=GD, gamma=GR, backend="jnp")
        sl = single_loop_tvl1_learn(sp[0], sp[1], 0.3, outer=250,
                                    n_inner=30, n_adj=8, lr=0.05,
                                    gamma_d=GD, gamma=GR)
        assert abs(float(sl.alpha) - float(tr.x)) < 0.15 * float(tr.x)
        costs = np.asarray(sl.cost_trajectory)
        assert costs[-1] < costs[0]

    def test_patch_shapes_and_descent(self, sp):
        sl = single_loop_tvl1_learn(sp[0], sp[1], 0.3 * np.ones((2, 2)),
                                    outer=60, n_inner=20, n_adj=5,
                                    gamma_d=GD, gamma=GR)
        assert sl.alpha.shape == (2, 2)
        assert np.all(np.asarray(sl.alpha) > 0)
        costs = np.asarray(sl.cost_trajectory)
        assert costs[-1] < costs[0]

    def test_mesh_matches_single_device(self, sp4):
        """Per-image CG dots make the sharded trajectory equal the joint
        one to float-noise level."""
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
        kw = dict(outer=40, n_inner=15, n_adj=5, gamma_d=GD, gamma=GR)
        one = single_loop_tvl1_learn(sp4[0], sp4[1], 0.3, **kw)
        par = single_loop_tvl1_learn(sp4[0], sp4[1], 0.3, mesh=mesh, **kw)
        np.testing.assert_allclose(float(par.alpha), float(one.alpha),
                                   rtol=1e-8)
        # uneven: 3 images over 4 devices (one zero-padded shard)
        one3 = single_loop_tvl1_learn(sp4[0][:3], sp4[1][:3], 0.3, **kw)
        par3 = single_loop_tvl1_learn(sp4[0][:3], sp4[1][:3], 0.3,
                                      mesh=mesh, **kw)
        np.testing.assert_allclose(float(par3.alpha), float(one3.alpha),
                                   rtol=1e-8)
        assert par3.u.shape == one3.u.shape

    def test_rejects_nonpositive_x0(self, sp):
        with pytest.raises(ValueError, match="strictly positive"):
            single_loop_tvl1_learn(sp[0], sp[1], 0.0, outer=2)


# ---------------------------------------------------------------------------
# Experiment front-end (method= dispatch)
# ---------------------------------------------------------------------------

class TestExperimentFrontEnd:
    @pytest.fixture(autouse=True)
    def out_in_tmpdir(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        yield tmp_path

    FAST = dict(inner_maxiter=200, maxiter=2, verbose_iter=100,
                backend="jnp")

    def test_scalar_tr_fused(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tvl1_learn
        res = scalar_bilevel_tvl1_learn(method="tr_fused", **self.FAST)
        assert np.isfinite(float(res.x)) and float(res.x) > 0
        d = os.path.join("output", "circle_sp_128_20")
        assert any(f.endswith("_quality.txt") for f in os.listdir(d))

    def test_patch_tr_fused(self):
        from bpldenoising_tpu.experiments import patch_bilevel_tvl1_learn
        res = patch_bilevel_tvl1_learn(method="tr_fused", **self.FAST)
        assert res.x.shape == (2, 2)

    def test_scalar_single_loop(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tvl1_learn
        res = scalar_bilevel_tvl1_learn(method="single_loop", sl_outer=10,
                                        sl_inner=5, sl_adj=2,
                                        dataset_name="circle_sp")
        assert np.isfinite(float(res.x)) and float(res.x) > 0
        # cost trajectory is logged (real entries, not all-zero telemetry)
        assert len(res.state.log) > 0

    def test_rejects_unknown_method(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tvl1_learn
        with pytest.raises(ValueError, match="method"):
            scalar_bilevel_tvl1_learn(method="nope", **self.FAST)
