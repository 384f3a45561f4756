"""Unit tests: config merge semantics, checkpoint/resume, krylov solvers,
L-BFGS model, profiling helpers, iteration-harness cadence/timing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel.harness import _should_log, bilevel_iterate
from bpldenoising_tpu.solvers.krylov import bicgstab, cg
from bpldenoising_tpu.solvers.lbfgs import LBFGSModel
from bpldenoising_tpu.utils import (
    Params,
    SectionTimer,
    load_checkpoint,
    merge,
    save_checkpoint,
)


class TestParams:
    def test_right_biased_merge(self):
        p = merge(Params(a=1, b=2), Params(b=3), c=4)
        assert p.a == 1 and p.b == 3 and p.c == 4

    def test_immutable(self):
        p = Params(a=1)
        with pytest.raises(AttributeError):
            p.a = 2

    def test_or_operator(self):
        p = Params(a=1) | dict(a=5, b=6)
        assert p.a == 5 and p.b == 6

    def test_none_merge(self):
        assert merge(None, Params(a=1), None).a == 1

    def test_mapping_protocol(self):
        p = Params(a=1, b=2)
        assert dict(p) == {"a": 1, "b": 2}
        assert p.get("z", 9) == 9


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, x=np.array([1.0, 2.0]), delta=0.05,
                        iteration=7)
        state = load_checkpoint(path)
        np.testing.assert_array_equal(state["x"], [1.0, 2.0])
        assert float(state["delta"]) == 0.05
        assert int(state["iteration"]) == 7

    def test_missing_returns_none(self, tmp_path):
        assert load_checkpoint(str(tmp_path / "nope.npz")) is None

    def test_experiment_resume(self, tmp_path, monkeypatch):
        import bpldenoising_tpu.experiments.api as api
        monkeypatch.chdir(tmp_path)
        fast = dict(inner_maxiter=200, dataset_name="circle",
                    num_samples=1, checkpoint=True)
        res1 = api.scalar_bilevel_tv_learn(maxiter=2, **fast)
        # resume continues from the stored iterate; maxiter is the TOTAL
        # budget, so the resumed run performs only the remaining iterations
        # and the perf log's iter column stays monotonic across the resume
        res2 = api.scalar_bilevel_tv_learn(resume=True, maxiter=4, **fast)
        assert res2.cost <= res1.cost + 1e-9
        iters = [e.iter for e in res2.state.log]
        assert iters == sorted(iters) and len(set(iters)) == len(iters)
        assert max(iters) <= 4
        assert res2.iterations <= 4

        # resuming with an already-exhausted budget performs no new
        # iterations (the restored history alone fills the log)
        res3 = api.scalar_bilevel_tv_learn(resume=True, maxiter=2, **fast)
        assert len(res3.state.log) <= len(res2.state.log)
        assert res3.iterations >= 2  # restored count, no new work


class TestKrylov:
    def spd_system(self, rng, n=40):
        A = rng.standard_normal((n, n))
        A = A @ A.T + n * np.eye(n)
        b = rng.standard_normal(n)
        return jnp.asarray(A), jnp.asarray(b)

    def test_cg_solves_spd(self, rng):
        A, b = self.spd_system(rng)
        x, info = cg(lambda v: A @ v, b, tol=1e-12, maxiter=200)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b),
                                   atol=1e-8)

    def test_cg_preconditioned_faster(self, rng):
        n = 60
        d = jnp.asarray(np.geomspace(1, 1e4, n))
        A = lambda v: d * v
        b = jnp.asarray(rng.standard_normal(n))
        _, plain = cg(A, b, tol=1e-10, maxiter=1000)
        _, prec = cg(A, b, tol=1e-10, maxiter=1000, M=lambda r: r / d)
        assert int(prec.iters) < int(plain.iters)

    def test_cg_batched_grouping_invariance(self, rng):
        """Per-item inner products: each item's solution (and trajectory)
        is independent of batch grouping — a stacked solve must equal the
        per-item solves bitwise-ish, unlike joint-inner-product cg."""
        from bpldenoising_tpu.solvers.krylov import cg_batched
        n = 12
        mats, rhs = [], []
        for _ in range(3):
            Ak = rng.standard_normal((n, n))
            mats.append(Ak @ Ak.T + n * np.eye(n))
            rhs.append(rng.standard_normal(n))
        Aj = jnp.asarray(np.stack(mats))
        b = jnp.asarray(np.stack(rhs))

        def A(v):   # blockwise: (..., 3, n) @ per-item matrix
            return jnp.einsum("kij,...kj->...ki", Aj, v)

        x_all, info = cg_batched(A, b, tol=1e-12, maxiter=300, item_ndim=1)
        assert bool(jnp.all(info.converged))
        assert info.resnorm.shape == (3,)
        for k in range(3):
            xk, _ = cg_batched(lambda v: Aj[k] @ v, b[k], tol=1e-12,
                               maxiter=300, item_ndim=1)
            np.testing.assert_allclose(np.asarray(x_all[k]),
                                       np.asarray(xk), atol=1e-12)
            np.testing.assert_allclose(np.asarray(Aj[k] @ x_all[k]),
                                       np.asarray(b[k]), atol=1e-7)

    def test_cg_batched_warm_start(self, rng):
        from bpldenoising_tpu.solvers.krylov import cg_batched
        n = 16
        Ak = rng.standard_normal((n, n))
        A = jnp.asarray(Ak @ Ak.T + n * np.eye(n))
        b = jnp.asarray(rng.standard_normal(n))
        x, info_cold = cg_batched(lambda v: A @ v, b, tol=1e-10,
                                  maxiter=300)
        _, info_warm = cg_batched(lambda v: A @ v, b, x0=x, tol=1e-10,
                                  maxiter=300)
        assert int(info_warm.iters) <= 1

    def test_bicgstab_nonsymmetric(self, rng):
        n = 40
        A = rng.standard_normal((n, n)) + n * np.eye(n)
        Aj = jnp.asarray(A)
        b = jnp.asarray(rng.standard_normal(n))
        x, info = bicgstab(lambda v: Aj @ v, b, tol=1e-10, maxiter=400)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(Aj @ x), np.asarray(b),
                                   atol=1e-6)


class TestLBFGS:
    def test_inverse_and_forward_consistent(self, rng):
        n = 30
        H = rng.standard_normal((n, n))
        H = H @ H.T + n * np.eye(n)
        m = LBFGSModel(n, memory=20)
        for _ in range(40):
            s = rng.standard_normal(n) * 0.1
            m.update(H @ s, s)
        v = rng.standard_normal(n)
        # B (B⁻¹ v) ≈ v
        np.testing.assert_allclose(m.apply(m.solve(v)), v, rtol=1e-6,
                                   atol=1e-8)

    def test_learns_quadratic_hessian_action(self, rng):
        H = np.diag([2.0, 8.0, 1.0])
        m = LBFGSModel(3, memory=10)
        for _ in range(20):
            s = rng.standard_normal(3)
            m.update(H @ s, s)
        # limited-memory B only approximates H (B₀ = γI bias); direction
        # quality is what the dogleg needs
        v = rng.standard_normal(3)
        np.testing.assert_allclose(m.apply(v), H @ v, rtol=0.2)
        pn = m.newton_step(v)
        exact = -np.linalg.solve(H, v)
        cos = pn @ exact / (np.linalg.norm(pn) * np.linalg.norm(exact))
        assert cos > 0.99

    def test_skips_bad_curvature(self):
        m = LBFGSModel(2)
        m.update(np.array([-1.0, 0.0]), np.array([1.0, 0.0]))
        assert len(m.S) == 0

    def test_large_patch_uses_lbfgs(self):
        """bilevel_learn must switch to L-BFGS above the threshold."""
        from bpldenoising_tpu.bilevel import bilevel_learn
        calls = []

        def lf(x, ds, delta):
            calls.append(1)
            g = 2 * (x - 0.3)
            return np.zeros((1, 2, 2)), float(np.sum((x - 0.3) ** 2)), g

        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.2, maxiter=120, tol=1e-10, verbose_iter=0)
        res = bilevel_learn((None, None), lf,
                            xinit=0.1 * np.ones((10, 10)), params=params)
        np.testing.assert_allclose(res.x, 0.3, atol=1e-5)


class TestHarness:
    def test_cadence(self):
        # ref src/BilevelVisualise.jl:200 — OR of the three conditions
        assert _should_log(5, 1)
        assert _should_log(20, 1)
        assert _should_log(21, 1)         # verbose_iter=1 → every iteration
        assert not _should_log(21, 100)   # 21..200: only every 10th
        assert _should_log(30, 100)
        assert _should_log(201, 1)
        assert not _should_log(201, 100)
        assert _should_log(400, 100)
        assert not _should_log(5, 0)  # disabled (extension)

    def test_step_stop_request(self):
        count = [0]

        def step(verbose):
            count[0] += 1
            return count[0] >= 3

        st = bilevel_iterate(step, Params(maxiter=100, tol=0.0,
                                          verbose_iter=0))
        assert count[0] == 3

    def test_timing_excludes_first_iteration(self):
        entries = []

        def step(verbose):
            verbose(lambda: (0.0, np.zeros((2, 2)), 1.0, 1.0, 1.0, 0.0))

        st = bilevel_iterate(step, Params(maxiter=3, tol=0.0,
                                          verbose_iter=1))
        assert len(st.log) == 3
        assert st.log[0].time == 0.0  # clock starts after iteration 1


class TestProfiling:
    def test_section_timer(self):
        t = SectionTimer()
        with t.section("a"):
            x = sum(range(1000))
        assert t.totals["a"] > 0
        assert "a" in t.report()

    def test_trace_noop(self):
        from bpldenoising_tpu.utils import trace
        with trace(None):
            pass


class TestCheckpointModelState:
    def test_checkpoint_includes_B_and_log(self, tmp_path):
        """Regression: checkpoints must carry the BFGS model and log rows
        so resume does not restart with a fresh B (review finding)."""
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.utils import CheckpointWriter, load_checkpoint

        path = str(tmp_path / "ck.npz")
        ckpt = CheckpointWriter(path)

        def lf(x, ds, delta):
            g = 2 * (x - 0.3)
            return np.zeros((1, 2, 2)), float(np.sum((x - 0.3) ** 2)), g

        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=10, tol=1e-10, verbose_iter=1)
        bilevel_learn((None, None), lf, xinit=np.array([0.1, 0.2]),
                      params=params, checkpoint=ckpt)
        state = load_checkpoint(path)
        assert state["B"] is not None and state["B"].shape == (2, 2)
        assert state["log"].shape[0] > 0

    def test_resume_restores_B(self, tmp_path):
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.bilevel.trust_region import TRModel

        captured = {}

        def lf(x, ds, delta):
            g = 2 * (x - 0.3)
            return np.zeros((1, 2, 2)), float(np.sum((x - 0.3) ** 2)), g

        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=1, tol=1e-10, verbose_iter=0)
        B0 = np.diag([3.0, 5.0])
        res = bilevel_learn((None, None), lf, xinit=np.array([0.1, 0.2]),
                            params=params, init_B=B0,
                            checkpoint=lambda it, x, d, log, B=None:
                                captured.update(B=B))
        # after one iteration the captured B evolved FROM B0, not from 0.1*I
        assert captured["B"] is not None
        assert not np.allclose(captured["B"], np.eye(2) * 0.1)


class TestScheduleSalts:
    """Per-kernel-family Mosaic schedule salts + the pinned-salts loader
    (utils/compile_cache.py): families in different jitted modules draw
    independent compile lotteries, so each gets its own salt variable."""

    def _named(self):
        def kernel():
            pass
        return kernel

    def test_key_specific_salt_wins(self, monkeypatch):
        from bpldenoising_tpu.solvers.pdps_pallas import schedule_salt
        monkeypatch.setenv("BPL_MOSAIC_SALT", "glob")
        monkeypatch.setenv("BPL_MOSAIC_SALT_PDPS_COLD", "fam")
        assert schedule_salt(self._named(),
                             key="pdps_cold").__name__ == "kernel_fam"

    def test_global_fallback(self, monkeypatch):
        from bpldenoising_tpu.solvers.pdps_pallas import schedule_salt
        monkeypatch.setenv("BPL_MOSAIC_SALT", "glob")
        monkeypatch.delenv("BPL_MOSAIC_SALT_HG", raising=False)
        assert schedule_salt(self._named(),
                             key="hg").__name__ == "kernel_glob"
        assert schedule_salt(self._named()).__name__ == "kernel_glob"

    def test_empty_salt_noop(self, monkeypatch):
        from bpldenoising_tpu.solvers.pdps_pallas import schedule_salt
        for var in list(os.environ):
            if var.startswith("BPL_MOSAIC_SALT"):
                monkeypatch.delenv(var)
        assert schedule_salt(self._named(), key="ok").__name__ == "kernel"

    @pytest.fixture
    def _restore_cache_dir(self):
        # enable() redirects the process-wide compilation cache; restore
        # the conftest's dir so later tests keep their warm cache
        import jax
        prev = jax.config.jax_compilation_cache_dir
        yield
        jax.config.update("jax_compilation_cache_dir", prev)

    def test_salts_file_exports_env(self, tmp_path, monkeypatch,
                                    _restore_cache_dir):
        import json

        from bpldenoising_tpu.utils.compile_cache import enable
        for var in list(os.environ):
            if var.startswith("BPL_MOSAIC_SALT"):
                monkeypatch.delenv(var)
        (tmp_path / "MOSAIC_SALTS.json").write_text(
            json.dumps({"": "g1", "pdps_cold": "c1"}))
        monkeypatch.setenv("BPL_MOSAIC_SALT_PDPS_COLD", "preset")
        enable(str(tmp_path))
        # file populates unset vars; a pre-set env var wins (sweep override)
        assert os.environ["BPL_MOSAIC_SALT"] == "g1"
        assert os.environ["BPL_MOSAIC_SALT_PDPS_COLD"] == "preset"

    def test_plain_salt_file_back_compat(self, tmp_path, monkeypatch,
                                         _restore_cache_dir):
        from bpldenoising_tpu.utils.compile_cache import enable
        for var in list(os.environ):
            if var.startswith("BPL_MOSAIC_SALT"):
                monkeypatch.delenv(var)
        (tmp_path / "MOSAIC_SALT").write_text("legacy\n")
        enable(str(tmp_path))
        assert os.environ["BPL_MOSAIC_SALT"] == "legacy"
