"""Single-loop first-order vectorial-TV learner: big-budget step vs the
implicit-diff learning function, convergence to the trust-region valley,
patch parameterization, optax plug-in, data-parallel mesh equality, and
the experiment front-end routing (``method='single_loop'``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import single_loop_vtv_learn
from bpldenoising_tpu.learning.vtv import vtv_learning_function


def color_stack(rng, n=16, O=2, sigma=0.15):
    yy, xx = np.mgrid[0:n, 0:n]
    clean = np.zeros((O, 3, n, n), np.float32)
    for o in range(O):
        cx, cy = rng.uniform(4, n - 4, 2)
        r = rng.uniform(n / 5, n / 3)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        col = rng.uniform(0.2, 0.9, 3)
        for c in range(3):
            clean[o, c][mask] = col[c]
    noisy = clean + sigma * rng.standard_normal(clean.shape).astype(
        np.float32)
    return jnp.asarray(clean), jnp.asarray(noisy)


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(7)
    return color_stack(rng)


def test_big_budget_step_matches_implicit_cost(ds):
    """One outer step with a near-convergent inner budget reproduces the
    implicit-diff learning function's cost at the same α."""
    res = single_loop_vtv_learn(ds[0], ds[1], 0.08, outer=1, n_inner=3000,
                                n_adj=300, lr=0.0)
    _, cost, _ = vtv_learning_function(np.asarray(0.08), ds, 0.01,
                                       maxiter=3000)
    # the learner's inner loop is UNACCELERATED CP while the learning
    # function solves with accelerated PDPS — at 3000 f32 iterations the
    # two are each ~1e-4-converged but not to each other's iterate
    np.testing.assert_allclose(float(res.cost), float(cost), rtol=1e-3)


def test_converges_to_valley(ds):
    """Learned α is a near-stationary point of the implicit-diff cost and
    improves substantially over the start."""
    res = single_loop_vtv_learn(ds[0], ds[1], 0.02, outer=250, n_inner=40,
                                n_adj=10, lr=0.05)
    a = float(res.alpha)
    assert a > 0
    _, c0, _ = vtv_learning_function(np.asarray(0.02), ds, 0.01,
                                     maxiter=3000)
    _, cs, gs = vtv_learning_function(np.asarray(a), ds, 0.01, maxiter=3000)
    assert float(cs) < float(c0)
    rel = abs(float(gs) * a) / float(cs)
    assert rel < 2e-2


def test_cost_trajectory_decreases(ds):
    res = single_loop_vtv_learn(ds[0], ds[1], 0.02, outer=120, n_inner=40,
                                n_adj=10, lr=0.05)
    costs = np.asarray(res.cost_trajectory)
    assert costs.shape == (120,)
    assert costs[-1] < costs[5]
    assert res.alpha_trajectory.shape == (120,)


def test_patch_parameterization(ds):
    x0 = 0.05 * np.ones((2, 2))
    res = single_loop_vtv_learn(ds[0], ds[1], x0, outer=40, n_inner=30,
                                n_adj=8, lr=0.05)
    assert res.alpha.shape == (2, 2)
    assert np.all(np.asarray(res.alpha) > 0)


def test_single_image_squeeze(ds):
    res = single_loop_vtv_learn(ds[0][0], ds[1][0], 0.05, outer=10,
                                n_inner=20, n_adj=5, lr=0.05)
    assert res.u.shape == ds[0][0].shape


def test_optax_optimizer_matches_builtin_adam(ds):
    optax = pytest.importorskip("optax")
    opt = optax.adam(0.05, b1=0.9, b2=0.999, eps=1e-8)
    a = single_loop_vtv_learn(ds[0], ds[1], 0.05, outer=30, n_inner=20,
                              n_adj=5, lr=0.05)
    b = single_loop_vtv_learn(ds[0], ds[1], 0.05, outer=30, n_inner=20,
                              n_adj=5, optimizer=opt)
    # f32 accumulation-order noise between optax's adam and the built-in
    np.testing.assert_allclose(float(b.alpha), float(a.alpha), rtol=1e-4)


def test_mesh_matches_single_device():
    """Batch sharded over 4 devices: per-image CG dots + psum'd gradient
    reductions reproduce the joint run — including an uneven (padded)
    batch, whose zero images contribute exactly nothing."""
    from jax.sharding import Mesh
    rng = np.random.default_rng(11)
    ut, f = color_stack(rng, n=16, O=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
    kw = dict(outer=25, n_inner=20, n_adj=6, lr=0.05)
    one = single_loop_vtv_learn(ut, f, 0.05, **kw)
    par = single_loop_vtv_learn(ut, f, 0.05, mesh=mesh, **kw)
    np.testing.assert_allclose(float(par.alpha), float(one.alpha),
                               rtol=1e-6)
    one3 = single_loop_vtv_learn(ut[:3], f[:3], 0.05, **kw)
    par3 = single_loop_vtv_learn(ut[:3], f[:3], 0.05, mesh=mesh, **kw)
    np.testing.assert_allclose(float(par3.alpha), float(one3.alpha),
                               rtol=1e-6)
    assert par3.u.shape == one3.u.shape


def test_rejects_bad_inputs(ds):
    with pytest.raises(ValueError, match="scalar or an"):
        single_loop_vtv_learn(ds[0], ds[1], np.array([0.1, 0.2]), outer=1)
    with pytest.raises(ValueError, match="positive"):
        single_loop_vtv_learn(ds[0], ds[1], 0.0, outer=1)
    with pytest.raises(ValueError, match="color"):
        single_loop_vtv_learn(ds[0][0, 0], ds[1][0, 0], 0.05, outer=1)


def test_experiment_front_end(tmp_path, monkeypatch):
    """method='single_loop' runs behind the same experiment surface and
    lands artifacts in the standard layout."""
    import bpldenoising_tpu as bpl
    monkeypatch.chdir(tmp_path)
    res = bpl.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                       method="single_loop",
                                       sl_outer=20, sl_inner=20, sl_adj=5)
    assert float(res.x) > 0.0
    out = tmp_path / "output" / "color_disks_128_10"
    assert any(p.name.endswith("_quality.txt") for p in out.iterdir())
