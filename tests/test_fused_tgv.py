"""Fused on-device TGV² trust-region tests: parity with the host TR loop
(scalar and patch weights), warm-start mode, chunked dispatch, data-parallel
mesh equivalence, interpret-mode Pallas backend, and the experiment
front-end surface (method='tr_fused')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn, bilevel_learn_tgv_fused
from bpldenoising_tpu.learning.tgv import make_tgv_learning_function
from bpldenoising_tpu.utils.config import Params

PARAMS = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.02,
                maxiter=6, tol=1e-7)
INNER = 400


@pytest.fixture(scope="module")
def ds():
    rng = np.random.default_rng(3)
    n = 16
    clean = np.broadcast_to(np.linspace(0.0, 1.0, n), (n, n))
    noisy = clean + 0.1 * rng.standard_normal((n, n))
    return (jnp.asarray(clean)[None], jnp.asarray(noisy)[None])


@pytest.fixture(scope="module")
def ds4():
    rng = np.random.default_rng(4)
    n = 16
    clean = np.stack([np.broadcast_to(np.linspace(0, 1, n), (n, n))] * 4)
    noisy = clean + 0.1 * rng.standard_normal((4, n, n))
    return (jnp.asarray(clean), jnp.asarray(noisy))


def test_parity_matches_host_loop(ds):
    """inner_tol=None (fixed budget, cold starts) makes every fused
    evaluation the same computation as the host learning function — the
    learned weights must match the host trust-region loop tightly."""
    lf = make_tgv_learning_function(maxiter=INNER, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=np.array([0.05, 0.05]),
                         params=PARAMS)
    fused = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                    params=PARAMS, inner_maxiter=INNER,
                                    inner_tol=None, backend="jnp")
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                               rtol=1e-6)
    assert abs(float(fused.cost) - float(host.cost)) <= \
        1e-6 * max(1.0, float(host.cost))
    assert np.all(np.asarray(fused.x) > 0)


def test_warm_start_mode_lands_in_same_valley(ds):
    """Early-stop + chained (solver, adjoint-CG) warm starts change the
    iteration counts, not the minimizer."""
    cold = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                   params=PARAMS, inner_maxiter=2000,
                                   inner_tol=None, backend="jnp")
    warm = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                   params=PARAMS, inner_maxiter=2000,
                                   inner_tol=1e-7, check_every=100,
                                   backend="jnp")
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               rtol=5e-2)


def test_patch_parity_matches_host_loop(ds):
    """(2, 2, 2) patch grids through the fused loop land on the host
    oracle's parameters (dense BFGS model: n = 8 < threshold)."""
    x0 = 0.05 * np.ones((2, 2, 2))
    lf = make_tgv_learning_function(maxiter=INNER, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=x0, params=PARAMS)
    fused = bilevel_learn_tgv_fused(ds, xinit=x0, params=PARAMS,
                                    inner_maxiter=INNER, inner_tol=None,
                                    backend="jnp")
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                               rtol=1e-6)


def test_segmented_matches_single_dispatch(ds):
    seg = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                  params=PARAMS, inner_maxiter=INNER,
                                  inner_tol=None, backend="jnp",
                                  log_every=2)
    one = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                  params=PARAMS, inner_maxiter=INNER,
                                  inner_tol=None, backend="jnp")
    np.testing.assert_array_equal(np.asarray(seg.x), np.asarray(one.x))
    np.testing.assert_array_equal(np.asarray(seg.log), np.asarray(one.log))
    times = np.asarray(seg.times)
    assert times.shape == (int(seg.iterations),)
    assert np.all(times > 0) and np.all(np.diff(times) >= 0)


def test_mesh_matches_single_device(ds4):
    """Data-parallel fused TGV (batch sharded over 4 devices, psum'd cost
    and gradient) must reproduce the single-device run — including with a
    padded uneven batch."""
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
    one = bilevel_learn_tgv_fused(ds4, xinit=np.array([0.05, 0.05]),
                                  params=PARAMS, inner_maxiter=INNER,
                                  inner_tol=None, backend="jnp")
    par = bilevel_learn_tgv_fused(ds4, xinit=np.array([0.05, 0.05]),
                                  params=PARAMS, inner_maxiter=INNER,
                                  inner_tol=None, backend="jnp", mesh=mesh)
    # psum tree order ≠ single-device sum order: float noise only (the
    # batched per-image adjoint CG makes the math grouping-invariant; a
    # joint-inner-product CG differed at the 1e-3 level here)
    np.testing.assert_allclose(np.asarray(par.x), np.asarray(one.x),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(par.u), np.asarray(one.u),
                               atol=1e-6)
    # uneven batch: 3 images over 4 devices (one zero-padded shard)
    ds3 = (ds4[0][:3], ds4[1][:3])
    one3 = bilevel_learn_tgv_fused(ds3, xinit=np.array([0.05, 0.05]),
                                   params=PARAMS, inner_maxiter=INNER,
                                   inner_tol=None, backend="jnp")
    par3 = bilevel_learn_tgv_fused(ds3, xinit=np.array([0.05, 0.05]),
                                   params=PARAMS, inner_maxiter=INNER,
                                   inner_tol=None, backend="jnp", mesh=mesh)
    np.testing.assert_allclose(np.asarray(par3.x), np.asarray(one3.x),
                               rtol=1e-6)
    assert par3.u.shape == one3.u.shape


def test_pallas_backend_interpret(ds):
    """Scalar weights through the fused TGV kernel (interpret mode on CPU)
    agree with the XLA stencil path."""
    jnp_res = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                      params=PARAMS | dict(maxiter=3),
                                      inner_maxiter=200, inner_tol=None,
                                      backend="jnp")
    pal = bilevel_learn_tgv_fused(ds, xinit=np.array([0.05, 0.05]),
                                  params=PARAMS | dict(maxiter=3),
                                  inner_maxiter=200, inner_tol=None,
                                  backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(jnp_res.x),
                               rtol=1e-4)


def test_rejects_bad_param_shape(ds):
    with pytest.raises(ValueError, match="length-2"):
        bilevel_learn_tgv_fused(ds, xinit=np.array([0.1, 0.2, 0.3]),
                                params=PARAMS, backend="jnp")


class TestExperimentFrontEnd:
    @pytest.fixture(autouse=True)
    def out_in_tmpdir(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        yield tmp_path

    FAST = dict(inner_maxiter=200, maxiter=3, dataset_name="circle",
                num_samples=1, backend="jnp")

    def test_scalar_tr_fused(self):
        from bpldenoising_tpu.experiments import scalar_bilevel_tgv_learn
        res = scalar_bilevel_tgv_learn(method="tr_fused",
                                       alpha0=np.array([0.05, 0.05]),
                                       **self.FAST)
        assert res.x.shape == (2,)
        assert np.all(np.asarray(res.x) > 0)
        d = os.path.join("output", "circle_128_10")
        files = sorted(os.listdir(d))
        assert any(f.endswith("_quality.txt") for f in files)

    def test_patch_tr_fused(self):
        from bpldenoising_tpu.experiments import patch_bilevel_tgv_learn
        res = patch_bilevel_tgv_learn(method="tr_fused",
                                      alpha0=0.05 * np.ones((2, 2, 2)),
                                      **self.FAST)
        assert res.x.shape == (2, 2, 2)

    def test_checkpoint_and_log_times(self):
        """checkpoint=True switches to chunked dispatch: ckpt.npz exists
        and the per-iteration log carries real (monotone) wall times —
        same observability contract as the TV/sumregs fused path."""
        from bpldenoising_tpu.experiments import scalar_bilevel_tgv_learn
        res = scalar_bilevel_tgv_learn(method="tr_fused", checkpoint=True,
                                       log_every=2,
                                       alpha0=np.array([0.05, 0.05]),
                                       **self.FAST)
        d = os.path.join("output", "circle_128_10")
        assert any(f.endswith("_ckpt.npz") for f in os.listdir(d))
        times = [e.time for e in res.state.log]
        assert len(times) == res.iterations
        assert all(t > 0 for t in times)

    def test_resume_continues(self):
        """Interrupt after 2 iterations, resume with the full budget: the
        resumed run continues iteration numbering and lands where an
        uninterrupted run lands."""
        from bpldenoising_tpu.experiments import scalar_bilevel_tgv_learn
        kw = dict(self.FAST, maxiter=4, alpha0=np.array([0.05, 0.05]))
        full = scalar_bilevel_tgv_learn(method="tr_fused", **kw)
        scalar_bilevel_tgv_learn(method="tr_fused", checkpoint=True,
                                 log_every=2, **dict(kw, maxiter=2))
        res = scalar_bilevel_tgv_learn(method="tr_fused", resume=True,
                                       log_every=2, **kw)
        assert res.iterations >= 3
        iters = [e.iter for e in res.state.log]
        assert iters == sorted(iters) and len(set(iters)) == len(iters)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(full.x),
                                   rtol=5e-2)
