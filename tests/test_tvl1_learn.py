"""Huber-smoothed TV-L1 bilevel learning: smoothed solver limits,
finite-difference hypergradient oracles (scalar + patch), warm starts,
trust-region learning descent, experiment artifacts and CLI."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.data import add_impulse_noise, circle_phantom
from bpldenoising_tpu.learning.tvl1 import (make_tvl1_learning_function,
                                            tvl1_learning_function)
from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
from bpldenoising_tpu.solvers.tvl1 import tvl1_denoise
from bpldenoising_tpu.solvers.tvl1_huber import (tvl1_huber_denoise,
                                                 tvl1_huber_energy,
                                                 tvl1_huber_hypergrad)

GD, GR = 100.0, 1000.0


@pytest.fixture(scope="module")
def sp():
    clean = jnp.asarray(circle_phantom(24), jnp.float64)
    noisy = jnp.asarray(add_impulse_noise(np.asarray(clean), 0.2, 0),
                        jnp.float64)
    return clean, noisy


def test_large_gamma_limit_matches_tvl1(sp):
    """γ_d, γ_r → ∞ degenerates both resolvents to the TV-L1 ones."""
    _, noisy = sp
    u_lim = tvl1_huber_denoise(noisy, 0.8, gamma_d=1e7, gamma_r=1e9,
                               maxiter=3000)
    u_ref = tvl1_denoise(noisy, 0.8, maxiter=3000)
    np.testing.assert_allclose(np.asarray(u_lim), np.asarray(u_ref),
                               atol=1e-6)


def test_smoothed_energy_descends(sp):
    _, noisy = sp
    e0 = float(tvl1_huber_energy(noisy, noisy, 0.8, gamma_d=GD, gamma_r=GR))
    u = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR, maxiter=3000)
    e1 = float(tvl1_huber_energy(u, noisy, 0.8, gamma_d=GD, gamma_r=GR))
    assert e1 < 0.7 * e0


def test_warm_start_and_early_stop(sp):
    _, noisy = sp
    u1, st = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                maxiter=300, return_dual=True)
    u2 = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                            maxiter=300, state0=st)
    u_long = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                                maxiter=600)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_long),
                               atol=1e-12)
    u_tol = tvl1_huber_denoise(noisy, 0.8, gamma_d=GD, gamma_r=GR,
                               maxiter=5000, tol=1e-7, check_every=100)
    np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_long),
                               atol=5e-3)


def test_hypergrad_matches_fd_scalar(sp):
    """Implicit-differentiation hypergradient vs central finite
    differences of the smoothed bilevel cost (f64 oracle)."""
    clean, noisy = sp

    def J(a):
        u = tvl1_huber_denoise(noisy, a, gamma_d=GD, gamma_r=GR,
                               maxiter=20000)
        return float(0.5 * jnp.sum((u - clean) ** 2)), u

    a0, h = 0.6, 1e-4
    Jp, _ = J(a0 + h)
    Jm, _ = J(a0 - h)
    _, u0 = J(a0)
    fd = (Jp - Jm) / (2 * h)
    cfg = HypergradConfig(gamma=GR, cg_tol=1e-10, cg_maxiter=4000)
    (g,), _, _ = tvl1_huber_hypergrad(u0, noisy, clean, (jnp.asarray(a0),),
                                      cfg=cfg, gamma_d=GD)
    assert abs(float(g) - fd) < 1e-4 * abs(fd)


def test_learning_function_patch_matches_fd(sp):
    """The patch route (want_maps + PatchOp adjoint) against FD on one
    patch entry."""
    clean, noisy = sp
    ds = (clean, noisy)
    x0 = 0.6 * np.ones((2, 2))
    kw = dict(gamma_d=GD, gamma=GR, maxiter=20000, cg_tol=1e-10,
              cg_maxiter=4000)
    _, _, g = tvl1_learning_function(jnp.asarray(x0), ds, 1.0, **kw)
    assert g.shape == (2, 2)
    h = 1e-4
    costs = []
    for s in (+h, -h):
        xp = x0.copy()
        xp[0, 1] += s
        _, c, _ = tvl1_learning_function(jnp.asarray(xp), ds, 1.0, **kw)
        costs.append(float(c))
    fd = (costs[0] - costs[1]) / (2 * h)
    assert abs(float(g[0, 1]) - fd) < 5e-4 * max(abs(fd), 1e-3)


def test_factory_warm_start_consistency(sp):
    """Warm-started evaluations agree with cold ones (the gradient is
    evaluated at the returned solution, so chaining cannot bias it)."""
    clean, noisy = sp
    ds = (clean, noisy)
    lf = make_tvl1_learning_function(gamma_d=GD, gamma=GR, maxiter=4000,
                                     tol=1e-8)
    _, c1, g1 = lf(jnp.asarray(0.6), ds, 1.0)
    _, c2, g2 = lf(jnp.asarray(0.6), ds, 1.0)   # warm: same point
    assert abs(float(c1) - float(c2)) < 1e-5 * float(c1)
    assert abs(float(g1) - float(g2)) < 1e-3 * max(abs(float(g1)), 1e-6)


def test_trust_region_learn_descends(sp):
    """The TR loop on the smoothed hypergradient reduces the upper-level
    cost and moves α into the interior."""
    from bpldenoising_tpu.bilevel import bilevel_learn
    from bpldenoising_tpu.utils.config import Params
    clean, noisy = sp
    ds = (np.asarray(clean)[None], np.asarray(noisy)[None])
    lf = make_tvl1_learning_function(gamma_d=GD, gamma=GR, maxiter=2000)
    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                    delta0=0.1, maxiter=8, tol=1e-10, verbose_iter=100)
    res = bilevel_learn(ds, lf, xinit=0.3, params=params)
    _, c0, _ = lf(jnp.asarray(0.3), (ds[0][0], ds[1][0]), 1.0)
    assert float(res.cost) < 0.9 * float(c0)
    assert 0.3 < float(res.x) < 20.0


def test_experiment_front_end_and_guards(tmp_path, monkeypatch):
    from bpldenoising_tpu.experiments import scalar_bilevel_tvl1_learn
    monkeypatch.chdir(tmp_path)
    res = scalar_bilevel_tvl1_learn(maxiter=2, inner_maxiter=200,
                                    verbose_iter=100)
    assert np.isfinite(float(res.x))
    d = tmp_path / "output" / "circle_sp_128_20"
    names = [p.name for p in d.iterdir()]
    assert any(n.endswith("_quality.txt") for n in names)
    assert any(n.endswith("_reco_1.png") for n in names)
    with pytest.raises(ValueError, match="method"):
        scalar_bilevel_tvl1_learn(method="nope", maxiter=1,
                                  inner_maxiter=50)
    with pytest.raises(ValueError, match="inner_tol"):
        scalar_bilevel_tvl1_learn(data_parallel=True, inner_tol=1e-6,
                                  maxiter=1, inner_maxiter=50)


def test_cli_scalar_tvl1(tmp_path, monkeypatch, capsys):
    from bpldenoising_tpu.__main__ import main
    monkeypatch.chdir(tmp_path)
    main(["scalar-tvl1", "--maxiter", "2", "--inner-maxiter", "200"])
    out = capsys.readouterr().out
    assert "x = " in out and "cost = " in out


def test_implicit_diff_layer_matches_hypergrad(sp):
    """The custom_vjp layer's α-gradient equals the adjoint hypergradient
    (same smoothed system, cotangent route) and df flows."""
    import jax
    clean, noisy = sp
    ds_t = jnp.stack([clean, clean[::-1]])
    ds_n = jnp.stack([noisy, noisy[::-1]])
    from bpldenoising_tpu.solvers.tvl1_huber import make_diff_tvl1_denoise
    solve = make_diff_tvl1_denoise(maxiter=4000, cg_tol=1e-10,
                                   cg_maxiter=4000)
    g_ad = float(jax.grad(
        lambda a: 0.5 * jnp.sum((solve(ds_n, a) - ds_t) ** 2))(
            jnp.asarray(0.6)))
    u0 = tvl1_huber_denoise(ds_n, 0.6, gamma_d=GD, gamma_r=GR, maxiter=4000)
    cfg = HypergradConfig(gamma=GR, cg_tol=1e-10, cg_maxiter=4000)
    (g_hg,), _, _ = tvl1_huber_hypergrad(u0, ds_n, ds_t,
                                         (jnp.asarray(0.6),), cfg=cfg,
                                         gamma_d=GD)
    assert abs(g_ad - float(g_hg)) < 1e-8 * abs(g_ad)
    gf = jax.grad(lambda f: 0.5 * jnp.sum((solve(f, 0.6) - ds_t) ** 2))(
        ds_n)
    assert gf.shape == ds_n.shape and float(jnp.linalg.norm(gf)) > 0.0


class TestShardedTVL1:
    """Data-parallel TV-L1 learning function: sharded trajectory equals
    single-device to machine precision (per-image CG dots + zero backward
    on padded images)."""

    @pytest.fixture(scope="class")
    def ds5(self):
        clean = jnp.asarray(circle_phantom(32), jnp.float64)
        ts, ns = [], []
        for i in range(5):    # 5 images over 8 devices -> padding
            ts.append(np.asarray(clean))
            ns.append(add_impulse_noise(np.asarray(clean), 0.2, i))
        return (jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(ns)))

    def test_scalar_equivalence(self, ds5):
        from bpldenoising_tpu.parallel import (
            make_batch_mesh, make_sharded_tvl1_learning_function)
        lf = make_sharded_tvl1_learning_function(
            make_batch_mesh(), maxiter=1500, cg_tol=1e-10, cg_maxiter=2000)
        u_s, c_s, g_s = lf(0.6, ds5, 1.0)
        u_1, c_1, g_1 = tvl1_learning_function(
            jnp.asarray(0.6), ds5, 1.0, maxiter=1500, cg_tol=1e-10,
            cg_maxiter=2000)
        assert u_s.shape == u_1.shape == ds5[0].shape
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_1),
                                   atol=1e-12)
        assert abs(float(c_s) - float(c_1)) < 1e-9 * float(c_1)
        assert abs(float(g_s) - float(g_1)) < 1e-9 * abs(float(g_1))

    def test_patch_equivalence(self, ds5):
        from bpldenoising_tpu.parallel import (
            make_batch_mesh, make_sharded_tvl1_learning_function)
        lf = make_sharded_tvl1_learning_function(
            make_batch_mesh(), maxiter=1500, cg_tol=1e-10, cg_maxiter=2000)
        x = 0.6 * np.ones((2, 2))
        _, c_s, g_s = lf(x, ds5, 1.0)
        _, c_1, g_1 = tvl1_learning_function(
            jnp.asarray(x), ds5, 1.0, maxiter=1500, cg_tol=1e-10,
            cg_maxiter=2000)
        assert g_s.shape == (2, 2)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_1),
                                   atol=1e-9)
        assert abs(float(c_s) - float(c_1)) < 1e-9 * float(c_1)

    def test_experiment_data_parallel(self, tmp_path, monkeypatch):
        from bpldenoising_tpu.experiments import scalar_bilevel_tvl1_learn
        monkeypatch.chdir(tmp_path)
        res = scalar_bilevel_tvl1_learn(data_parallel=True, maxiter=2,
                                        inner_maxiter=150, verbose_iter=100)
        assert np.isfinite(float(res.x))
