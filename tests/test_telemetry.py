"""Adjoint-CG convergence telemetry (utils/telemetry.py).

The reference errors when its Krylov solve fails to converge
(``src/TRBox.jl:137-139``); the TPU-native equivalent is a RuntimeWarning
plus surfaced statistics: running stats on the learning-function closure
(``lf.adjoint_cg`` / ``lf.last_adjoint_cg``), two extra columns in the
per-iteration log (host AND fused paths), and mesh-reduced counters on the
sharded paths.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
from bpldenoising_tpu.learning import make_tv_learning_function
from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
from bpldenoising_tpu.utils.config import Params
from bpldenoising_tpu.utils.telemetry import AdjointCGStats, record_adjoint_cg
from bpldenoising_tpu.viz.log import BilevelLogEntry, IterLog, write_log

PARAMS = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                maxiter=4, tol=1e-5, verbose_iter=1)
INNER = 300


@pytest.fixture
def ds(rng):
    n = 12
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(
        np.float64)
    noisy = clean + 0.1 * rng.standard_normal((n, n))
    return (jnp.asarray(clean)[None], jnp.asarray(noisy)[None])


class TestFactoryTelemetry:
    def test_unconverged_cg_warns_and_reports(self, ds):
        # crippled budget: 1 CG iteration cannot converge the adjoint solve
        lf = make_tv_learning_function(
            maxiter=INNER, backend="jnp",
            cfg=HypergradConfig(cg_maxiter=1, cg_tol=1e-12))
        with pytest.warns(RuntimeWarning, match="CG did not converge"):
            lf(0.1, ds, 0.1)
        assert lf.last_adjoint_cg["converged"] is False
        assert lf.adjoint_cg.n_unconverged >= 1
        assert np.isfinite(lf.last_adjoint_cg["resnorm"])

    def test_converged_cg_silent(self, ds):
        lf = make_tv_learning_function(maxiter=INNER, backend="jnp")
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            lf(0.1, ds, 0.1)
        assert lf.last_adjoint_cg["converged"] is True
        assert lf.adjoint_cg.n_unconverged == 0
        assert lf.adjoint_cg.n_solves == 1
        assert lf.last_adjoint_cg["iters"] >= 1

    def test_stats_accumulate(self, ds):
        lf = make_tv_learning_function(maxiter=INNER, backend="jnp")
        lf(0.1, ds, 0.1)
        lf(0.2, ds, 0.1)
        assert lf.adjoint_cg.n_solves == 2
        assert lf.adjoint_cg.iters_total >= lf.adjoint_cg.max_iters >= 1

    def test_stats_dict(self):
        st = AdjointCGStats()
        st.update(7, 1e-9, True)
        st.update(100, 3e-2, False)
        d = st.as_dict()
        assert d["n_solves"] == 2 and d["n_unconverged"] == 1
        assert d["max_iters"] == 100 and d["iters_total"] == 107
        assert d["last_converged"] is False


class TestHostLoopTelemetry:
    def test_log_entries_carry_cg_fields(self, ds):
        lf = make_tv_learning_function(maxiter=INNER, backend="jnp")
        res = bilevel_learn(ds, lf, xinit=0.1, params=PARAMS)
        assert len(res.state.log) > 0
        for e in res.state.log:
            assert np.isfinite(e.adjoint_cg_iters)
            assert e.adjoint_cg_converged == 1.0

    def test_unconverged_flag_in_log(self, ds):
        lf = make_tv_learning_function(
            maxiter=INNER, backend="jnp",
            cfg=HypergradConfig(cg_maxiter=1, cg_tol=1e-12))
        with pytest.warns(RuntimeWarning):
            res = bilevel_learn(ds, lf, xinit=0.1, params=PARAMS)
        # stalled solves surface in the log (a zero-RHS AL sub-solve can
        # legitimately converge in 0 iterations, so not ALL entries flag)
        assert any(e.adjoint_cg_converged == 0.0 for e in res.state.log)
        assert lf.adjoint_cg.n_unconverged >= 1

    def test_plain_closure_logs_nan(self, ds):
        # a bare closure (no factory) carries no telemetry: NaN columns,
        # serialized format unchanged
        from bpldenoising_tpu.learning import tv_learning_function
        res = bilevel_learn(ds, tv_learning_function, xinit=0.1,
                            params=PARAMS)
        assert all(np.isnan(e.adjoint_cg_iters) for e in res.state.log)


class TestFusedLoopTelemetry:
    def test_log_matrix_cg_columns(self, ds):
        res = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                                  inner_maxiter=INNER, inner_tol=None,
                                  backend="jnp")
        k = int(res.iterations)
        log = np.asarray(res.log)
        assert log.shape[1] == 6
        # CG iteration counts (a zero-RHS AL sub-solve may report 0)
        assert np.all(np.isfinite(log[:k, 4])) and np.max(log[:k, 4]) >= 1
        assert np.all(log[:k, 5] == 1.0)        # all converged

    def test_unconverged_counter(self, ds):
        res = bilevel_learn_fused(
            ds, xinit=0.1, params=PARAMS, inner_maxiter=INNER,
            inner_tol=None, backend="jnp",
            cfg=HypergradConfig(cg_maxiter=1, cg_tol=1e-12))
        k = int(res.iterations)
        log = np.asarray(res.log)
        assert np.any(log[:k, 5] == 0.0)        # non-convergence surfaced


class TestWriteLog:
    def test_cg_columns_serialized(self, tmp_path):
        log = IterLog()
        e = BilevelLogEntry(1, 0.5, 1.0, 0.1, 0.05, 0.01)
        e.adjoint_cg_iters = 42.0
        e.adjoint_cg_converged = 1.0
        log.append(e)
        path = str(tmp_path / "perf.txt")
        write_log(path, log)
        text = open(path).read()
        assert "adjoint_cg_iters" in text and "\t42\t1" in text

    def test_no_cg_columns_without_telemetry(self, tmp_path):
        log = IterLog()
        log.append(BilevelLogEntry(1, 0.5, 1.0, 0.1, 0.05, 0.01))
        path = str(tmp_path / "perf.txt")
        write_log(path, log)
        header = open(path).readline()
        assert "adjoint_cg" not in header


class TestShardedTelemetry:
    def test_sharded_tv_records(self, ds):
        import jax
        from bpldenoising_tpu.parallel import make_batch_mesh
        from bpldenoising_tpu.parallel.sharded import (
            make_sharded_tv_learning_function,
        )
        mesh = make_batch_mesh(min(2, len(jax.devices())))
        lf = make_sharded_tv_learning_function(maxiter=INNER, mesh=mesh)
        lf(jnp.asarray(0.1), ds, 0.1)
        assert lf.adjoint_cg.n_solves == 1
        assert lf.last_adjoint_cg["converged"] is True


def test_record_adjoint_cg_reduces_arrays():
    from bpldenoising_tpu.solvers.krylov import KrylovInfo

    class Holder:
        pass

    h = Holder()
    info = KrylovInfo(jnp.asarray([3, 9]), jnp.asarray([1e-9, 2e-8]),
                      jnp.asarray([True, True]))
    entry = record_adjoint_cg(h, info)
    assert entry == {"iters": 9, "resnorm": 2e-8, "converged": True}
    info2 = KrylovInfo(jnp.asarray([3, 500]), jnp.asarray([1e-9, 5e-2]),
                       jnp.asarray([True, False]))
    with pytest.warns(RuntimeWarning, match="CG did not converge"):
        record_adjoint_cg(h, info2)
    assert h.adjoint_cg.n_solves == 2 and h.adjoint_cg.n_unconverged == 1
    assert h.last_adjoint_cg["converged"] is False
