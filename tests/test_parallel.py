"""Multi-device (8 virtual CPU devices) sharding tests — SURVEY.md §4:
"a multi-device test path using CPU mesh emulation so sharded runs are
testable without a TPU pod"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.learning import tv_learning_function
from bpldenoising_tpu.parallel import (
    make_batch_mesh,
    make_sharded_sumregs_learning_function,
    make_sharded_tv_learning_function,
    pad_batch,
)
from bpldenoising_tpu.solvers.hypergrad import HypergradConfig
from bpldenoising_tpu.utils.config import Params

# Sharded-vs-unsharded gradients solve the same block-diagonal system with
# different Krylov subspaces (per-shard vs joint), so they agree only to
# the CG stall floor.  At an UNCONVERGED inner solution u the exact
# hypergradient system is near-singular (pixels with |∇u| barely above
# act_tol contribute 1/|∇u|³ curvature), which puts that floor around 1e-5
# relative even in float64 — hence the loose gradient tolerances here.
CFG = HypergradConfig(cg_tol=1e-12, cg_maxiter=20000, al_iters=6)
GRAD_RTOL = 2e-4


def small_ds(rng, n=16, O=8, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = np.stack([clean] * O) \
        + 0.01 * rng.standard_normal((O, n, n))  # decorrelate images
    noisy = true_ + sigma * rng.standard_normal((O, n, n))
    return jnp.asarray(true_), jnp.asarray(noisy)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_batch_mesh(8)


class TestPadBatch:
    def test_no_pad_needed(self):
        a, w = pad_batch(jnp.ones((8, 4, 4)), 8)
        assert a.shape[0] == 8 and float(w.sum()) == 8

    def test_pads_and_weights(self):
        a, w = pad_batch(jnp.ones((10, 4, 4)), 8)
        assert a.shape[0] == 16
        assert float(w.sum()) == 10
        np.testing.assert_array_equal(np.asarray(a[10:]), 0.0)


class TestShardedTV:
    def test_matches_unsharded_scalar(self, rng, mesh):
        ds = small_ds(rng, O=8)
        lf = make_sharded_tv_learning_function(mesh, maxiter=400, cfg=CFG)
        u_s, c_s, g_s = lf(0.1, ds, 0.1)
        u_r, c_r, g_r = tv_learning_function(0.1, ds, 0.1, maxiter=400,
                                             cfg=CFG)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r),
                                   atol=1e-10)
        np.testing.assert_allclose(float(c_s), float(c_r), rtol=1e-12)
        np.testing.assert_allclose(float(g_s), float(g_r),
                                   rtol=GRAD_RTOL)

    def test_matches_unsharded_uneven_batch(self, rng, mesh):
        ds = small_ds(rng, O=5)  # 5 does not divide 8 → padding path
        lf = make_sharded_tv_learning_function(mesh, maxiter=300, cfg=CFG)
        u_s, c_s, g_s = lf(0.1, ds, 0.1)
        u_r, c_r, g_r = tv_learning_function(0.1, ds, 0.1, maxiter=300,
                                             cfg=CFG)
        assert u_s.shape == ds[0].shape
        np.testing.assert_allclose(float(c_s), float(c_r), rtol=1e-12)
        np.testing.assert_allclose(float(g_s), float(g_r),
                                   rtol=GRAD_RTOL)

    def test_patch_parameter(self, rng, mesh):
        ds = small_ds(rng, O=8)
        lf = make_sharded_tv_learning_function(mesh, maxiter=300, cfg=CFG)
        x = jnp.full((2, 2), 0.1)
        u_s, c_s, g_s = lf(x, ds, 0.1)
        u_r, c_r, g_r = tv_learning_function(x, ds, 0.1, maxiter=300,
                                             cfg=CFG)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                                   rtol=GRAD_RTOL)

    def test_reg_branch(self, rng, mesh):
        ds = small_ds(rng, O=8)
        lf = make_sharded_tv_learning_function(mesh, maxiter=300, cfg=CFG)
        _, _, g_s = lf(0.1, ds, 1e-9)
        _, _, g_r = tv_learning_function(0.1, ds, 1e-9, maxiter=300,
                                         cfg=CFG)
        np.testing.assert_allclose(float(g_s), float(g_r),
                                   rtol=GRAD_RTOL)


class TestShardedSumregs:
    def test_matches_unsharded_vector(self, rng, mesh):
        from bpldenoising_tpu.learning import sumregs_learning_function
        ds = small_ds(rng, O=8)
        lf = make_sharded_sumregs_learning_function(mesh, maxiter=300,
                                                     cfg=CFG)
        x = jnp.asarray([0.05, 0.03, 0.02])
        _, c_s, g_s = lf(x, ds, 0.1)
        _, c_r, g_r = sumregs_learning_function(x, ds, 0.1, maxiter=300,
                                                cfg=CFG)
        np.testing.assert_allclose(float(c_s), float(c_r), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                                   rtol=GRAD_RTOL)


class TestShardedBilevel:
    def test_full_bilevel_on_mesh(self, rng, mesh):
        """The complete training loop with the sharded learning function —
        what the driver's dryrun_multichip exercises."""
        ds = small_ds(rng, O=8)
        lf = make_sharded_tv_learning_function(mesh, maxiter=300)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=4, tol=1e-5, verbose_iter=0)
        res = bilevel_learn(ds, lf, xinit=0.1, params=params)
        assert np.isfinite(res.cost)
        assert float(res.x) > 0


class TestExperimentDataParallel:
    def test_scalar_tv_learn_data_parallel(self, tmp_path, monkeypatch):
        """The user-facing experiment runs sharded over all 8 virtual
        devices and matches the single-device result."""
        import bpldenoising_tpu.experiments.api as api
        monkeypatch.chdir(tmp_path)
        fast = dict(dataset_name="faces_train", num_samples=8,
                    inner_maxiter=200, maxiter=2, backend="jnp")
        res_dp = api.scalar_bilevel_tv_learn(data_parallel=True, **fast)
        res_sd = api.scalar_bilevel_tv_learn(**fast)
        np.testing.assert_allclose(float(res_dp.x), float(res_sd.x),
                                   rtol=2e-4)
        np.testing.assert_allclose(res_dp.cost, res_sd.cost, rtol=1e-4)


class TestShardedPallas:
    def test_pallas_backend_under_shard_map(self, rng, mesh):
        """VERDICT round-1 item 7: the fused kernel runs per shard inside
        shard_map (interpret mode on the virtual CPU mesh)."""
        ds = small_ds(rng, O=8)
        lf_p = make_sharded_tv_learning_function(
            mesh, maxiter=300, cfg=CFG, backend="pallas", interpret=True)
        lf_j = make_sharded_tv_learning_function(mesh, maxiter=300, cfg=CFG)
        u_p, c_p, g_p = lf_p(0.1, ds, 0.1)
        u_j, c_j, g_j = lf_j(0.1, ds, 0.1)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_j),
                                   atol=1e-10)
        np.testing.assert_allclose(float(c_p), float(c_j), rtol=1e-12)
        np.testing.assert_allclose(float(g_p), float(g_j), rtol=1e-6)


class TestShardedWarmStart:
    def test_adjoint_state_threads_across_calls(self, rng, mesh):
        """The sharded factory warm-starts the adjoint CG from the previous
        call (round 1 dropped the state): a second identical call must
        return the same gradient, and the factory must hold per-branch
        state keyed by dataset identity."""
        ds = small_ds(rng, O=8)
        lf = make_sharded_tv_learning_function(mesh, maxiter=300, cfg=CFG)
        _, _, g1 = lf(0.1, ds, 0.1)
        _, _, g2 = lf(0.1, ds, 0.1)      # warm-started repeat
        np.testing.assert_allclose(float(g2), float(g1), rtol=1e-6)
        _, _, g3 = lf(0.11, ds, 0.1)     # nearby α, warm
        assert np.isfinite(float(g3))


class TestSingleLoopDataParallel:
    def test_mesh_matches_single_device(self, rng, mesh):
        from bpldenoising_tpu.bilevel.first_order import single_loop_learn
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng, O=8)
        kw = dict(outer=20, n_inner=10, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, 0.05, tv_model(), **kw)
        dp = single_loop_learn(utrue, f, 0.05, tv_model(), mesh=mesh, **kw)
        np.testing.assert_allclose(float(dp.alpha), float(ref.alpha),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dp.u), np.asarray(ref.u),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(dp.cost_trajectory),
                                   np.asarray(ref.cost_trajectory),
                                   rtol=1e-10)

    def test_uneven_batch(self, rng, mesh):
        from bpldenoising_tpu.bilevel.first_order import single_loop_learn
        from bpldenoising_tpu.models import tv_model
        utrue, f = small_ds(rng, O=5)   # pads to 8
        kw = dict(outer=15, n_inner=10, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, 0.05, tv_model(), **kw)
        dp = single_loop_learn(utrue, f, 0.05, tv_model(), mesh=mesh, **kw)
        assert dp.u.shape == utrue.shape
        np.testing.assert_allclose(float(dp.alpha), float(ref.alpha),
                                   rtol=1e-10)

    def test_experiment_flag(self, rng, mesh, tmp_path, monkeypatch):
        import bpldenoising_tpu.experiments.api as api
        monkeypatch.chdir(tmp_path)
        fast = dict(dataset_name="faces_train", num_samples=8,
                    method="single_loop", sl_outer=10, sl_inner=5, sl_adj=2)
        res_dp = api.scalar_bilevel_tv_learn(data_parallel=True, **fast)
        res_sd = api.scalar_bilevel_tv_learn(**fast)
        np.testing.assert_allclose(float(res_dp.x), float(res_sd.x),
                                   rtol=1e-8)


class TestFusedDataParallel:
    def test_fused_mesh_matches_single_device(self, rng, mesh):
        """The entire trust-region loop — one dispatch — sharded over the
        batch matches the single-device fused loop (psum'd cost/gradient
        make the replicated TR logic identical; per-shard CG trajectories
        differ only within the stall floor)."""
        from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
        ds = small_ds(rng, O=8)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=6, tol=1e-5, verbose_iter=0)
        kw = dict(xinit=0.1, params=params, inner_maxiter=300,
                  inner_tol=None, backend="jnp", cfg=CFG)
        ref = bilevel_learn_fused(ds, **kw)
        dp = bilevel_learn_fused(ds, mesh=mesh, **kw)
        np.testing.assert_allclose(float(dp.x), float(ref.x), rtol=2e-4)
        np.testing.assert_allclose(float(dp.cost), float(ref.cost),
                                   rtol=1e-6)
        assert int(dp.iterations) == int(ref.iterations)
        assert dp.u.shape == ds[0].shape

    def test_fused_mesh_uneven_batch(self, rng, mesh):
        from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
        ds = small_ds(rng, O=5)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=4, tol=1e-5, verbose_iter=0)
        kw = dict(xinit=0.1, params=params, inner_maxiter=300,
                  inner_tol=1e-8, check_every=100, backend="jnp", cfg=CFG)
        ref = bilevel_learn_fused(ds, **kw)
        dp = bilevel_learn_fused(ds, mesh=mesh, **kw)
        assert dp.u.shape == ds[0].shape
        np.testing.assert_allclose(float(dp.x), float(ref.x), rtol=2e-4)

    def test_fused_pallas_under_mesh_interpret(self, rng, mesh):
        """The full fused+pallas+mesh composition (VERDICT r2 item 7): the
        Pallas PDPS/hypergradient kernels run per shard inside the fused
        trust-region shard_map (interpret mode on the CPU mesh) and match
        the single-device pallas run."""
        from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
        ds = small_ds(rng, O=8)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.1, maxiter=3, tol=1e-5, verbose_iter=0)
        kw = dict(xinit=0.1, params=params, inner_maxiter=200,
                  inner_tol=None, backend="pallas", interpret=True, cfg=CFG)
        ref = bilevel_learn_fused(ds, **kw)
        dp = bilevel_learn_fused(ds, mesh=mesh, **kw)
        np.testing.assert_allclose(float(dp.x), float(ref.x), rtol=2e-4)
        np.testing.assert_allclose(float(dp.cost), float(ref.cost),
                                   rtol=1e-6)


# ---------------------------------------------------------------------------
# Multi-host initialization helper
# ---------------------------------------------------------------------------

class TestInitializeDistributed:
    def test_noop_without_cluster_env(self, monkeypatch):
        from bpldenoising_tpu.parallel import initialize_distributed
        from bpldenoising_tpu.parallel import distributed as dist
        for v in dist._CLUSTER_ADDRESS_VARS + dist._CLUSTER_COUNT_VARS:
            monkeypatch.delenv(v, raising=False)
        assert initialize_distributed() is False

    def test_slurm_single_node_is_noop(self, monkeypatch):
        from bpldenoising_tpu.parallel import initialize_distributed
        monkeypatch.setenv("SLURM_JOB_NUM_NODES", "1")
        assert initialize_distributed() is False

    def test_ompi_single_process_is_noop(self, monkeypatch):
        """ADVICE r2: single-process mpirun must not start a coordinator."""
        from bpldenoising_tpu.parallel import initialize_distributed
        monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "1")
        assert initialize_distributed() is False

    def test_ompi_multi_process_triggers(self, monkeypatch):
        import jax
        from bpldenoising_tpu.parallel import initialize_distributed
        called = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.setdefault("yes", True))
        monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "4")
        assert initialize_distributed() is True

    def test_cluster_env_triggers_initialize(self, monkeypatch):
        import jax
        from bpldenoising_tpu.parallel import initialize_distributed
        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            calls["args"] = (coordinator_address, num_processes, process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        assert initialize_distributed() is True
        assert calls["args"] == (None, None, None)

    def test_explicit_args_force_initialize(self, monkeypatch):
        import jax
        from bpldenoising_tpu.parallel import initialize_distributed
        from bpldenoising_tpu.parallel import distributed as dist
        for v in dist._CLUSTER_ADDRESS_VARS + dist._CLUSTER_COUNT_VARS:
            monkeypatch.delenv(v, raising=False)
        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            calls["args"] = (coordinator_address, num_processes, process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        assert initialize_distributed("1.2.3.4:99", 4, 0) is True
        assert calls["args"] == ("1.2.3.4:99", 4, 0)


class TestShardedTGV:
    """Data-parallel TGV² learning function (beyond-reference family)."""

    def test_matches_single_device(self, rng, mesh):
        from bpldenoising_tpu.learning import tgv_learning_function
        from bpldenoising_tpu.parallel import \
            make_sharded_tgv_learning_function
        ds = small_ds(rng)
        x = np.array([0.1, 0.2])
        # CG run to stall on both sides: per-shard vs joint Krylov
        # subspaces agree only once the backward solves are converged
        # (same caveat as GRAD_RTOL above)
        lf = make_sharded_tgv_learning_function(
            mesh, maxiter=300, cg_tol=1e-12, cg_maxiter=4000)
        u_s, cost_s, grad_s = lf(x, ds, 0.01)
        u_r, cost_r, grad_r = tgv_learning_function(
            x, ds, 0.01, maxiter=300, cg_tol=1e-12, cg_maxiter=4000)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(cost_s), float(cost_r), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_r),
                                   rtol=1e-6)

    def test_uneven_batch(self, rng, mesh):
        from bpldenoising_tpu.learning import tgv_learning_function
        from bpldenoising_tpu.parallel import \
            make_sharded_tgv_learning_function
        ds = small_ds(rng, O=5)   # 5 images over 8 devices: zero-padded
        x = np.array([0.1, 0.2])
        lf = make_sharded_tgv_learning_function(
            mesh, maxiter=200, cg_tol=1e-12, cg_maxiter=4000)
        u_s, cost_s, grad_s = lf(x, ds, 0.01)
        u_r, cost_r, grad_r = tgv_learning_function(
            x, ds, 0.01, maxiter=200, cg_tol=1e-12, cg_maxiter=4000)
        assert u_s.shape == u_r.shape
        np.testing.assert_allclose(float(cost_s), float(cost_r), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_r),
                                   rtol=1e-6)

    def test_pallas_interpret_under_mesh(self, rng, mesh):
        from bpldenoising_tpu.parallel import \
            make_sharded_tgv_learning_function
        ds = small_ds(rng)
        x = np.array([0.1, 0.2])
        lf_p = make_sharded_tgv_learning_function(
            mesh, maxiter=150, backend="pallas", interpret=True)
        lf_j = make_sharded_tgv_learning_function(mesh, maxiter=150)
        u_p, cost_p, grad_p = lf_p(x, ds, 0.01)
        u_j, cost_j, grad_j = lf_j(x, ds, 0.01)
        np.testing.assert_allclose(float(cost_p), float(cost_j), rtol=1e-8)
        # default-cg_tol backward: forward-path rounding differences leave
        # ~1e-5 relative noise in the implicit gradient
        np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_j),
                                   rtol=5e-5)

    def test_full_bilevel_loop(self, rng, mesh):
        from bpldenoising_tpu.parallel import \
            make_sharded_tgv_learning_function
        ds = small_ds(rng)
        lf = make_sharded_tgv_learning_function(mesh, maxiter=200)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=3, tol=1e-5, verbose_iter=0)
        res = bilevel_learn(ds, lf, xinit=np.array([0.05, 0.05]),
                            params=params)
        assert res.x.shape == (2,)
        assert np.all(np.asarray(res.x) > 0)


class TestShardedVTV:
    """Data-parallel vectorial (color) TV learning function (beyond-ref)."""

    @staticmethod
    def _color_ds(rng, n=16, O=8, sigma=0.1):
        clean = np.clip(rng.random((O, 3, n, n)), 0.0, 1.0)
        noisy = clean + sigma * rng.standard_normal((O, 3, n, n))
        return jnp.asarray(clean), jnp.asarray(noisy)

    def test_matches_single_device(self, rng, mesh):
        from bpldenoising_tpu.learning import vtv_learning_function
        from bpldenoising_tpu.parallel import \
            make_sharded_vtv_learning_function
        ds = self._color_ds(rng)
        x = np.asarray(0.1)
        lf = make_sharded_vtv_learning_function(
            mesh, maxiter=300, cg_tol=1e-12, cg_maxiter=4000)
        u_s, cost_s, grad_s = lf(x, ds, 0.01)
        u_r, cost_r, grad_r = vtv_learning_function(
            jnp.asarray(x), ds, 0.01, maxiter=300, cg_tol=1e-12,
            cg_maxiter=4000)
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_r),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(cost_s), float(cost_r), rtol=1e-10)
        np.testing.assert_allclose(float(grad_s), float(grad_r), rtol=1e-6)

    def test_uneven_batch_pallas_interpret(self, rng, mesh):
        from bpldenoising_tpu.learning import vtv_learning_function
        from bpldenoising_tpu.parallel import \
            make_sharded_vtv_learning_function
        ds = self._color_ds(rng, O=5)   # 5 images over 8 devices: padded
        x = np.asarray(0.1)
        lf = make_sharded_vtv_learning_function(
            mesh, maxiter=150, backend="pallas", interpret=True,
            cg_tol=1e-12, cg_maxiter=4000)
        u_s, cost_s, grad_s = lf(x, ds, 0.01)
        u_r, cost_r, grad_r = vtv_learning_function(
            jnp.asarray(x), ds, 0.01, maxiter=150, cg_tol=1e-12,
            cg_maxiter=4000)
        assert u_s.shape == u_r.shape
        np.testing.assert_allclose(float(cost_s), float(cost_r), rtol=1e-8)
        np.testing.assert_allclose(float(grad_s), float(grad_r), rtol=5e-5)

    def test_full_bilevel_loop(self, rng, mesh):
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.parallel import \
            make_sharded_vtv_learning_function
        from bpldenoising_tpu.utils.config import Params
        ds = self._color_ds(rng, sigma=0.15)
        lf = make_sharded_vtv_learning_function(mesh, maxiter=200)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=4, tol=1e-8, verbose_iter=0)
        res = bilevel_learn(ds, lf, xinit=np.asarray(0.05), params=params)
        assert float(res.x) > 0.0
        assert np.isfinite(res.cost)
