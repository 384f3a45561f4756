"""Row-sharded (halo-exchange) stencils and PDPS vs single-device oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.ops import (
    BwdGradientOp,
    CenteredGradientOp,
    FwdGradientOp,
)
from bpldenoising_tpu.parallel.halo import (
    ROWS_AXIS,
    _ROW_STENCILS,
    denoise_pdps_row_sharded,
)
from bpldenoising_tpu.solvers import denoise_pdps


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8])
    return Mesh(devs, (ROWS_AXIS,))


OPS = [FwdGradientOp(), BwdGradientOp(), CenteredGradientOp()]


@pytest.mark.parametrize("op", OPS, ids=lambda o: type(o).__name__)
def test_halo_stencils_match_global(op, mesh, rng):
    """Sharded row stencil + adjoint ≡ global stencil on gathered data."""
    u = jnp.asarray(rng.standard_normal((32, 16)))
    p = jnp.asarray(rng.standard_normal((32, 16)))
    row_fwd, row_adj = _ROW_STENCILS[type(op)]

    fwd = shard_map(row_fwd, mesh=mesh, in_specs=P(ROWS_AXIS, None),
                    out_specs=P(ROWS_AXIS, None))
    adj = shard_map(row_adj, mesh=mesh, in_specs=P(ROWS_AXIS, None),
                    out_specs=P(ROWS_AXIS, None))

    # oracle: the ops layer's 1-D stencils along axis 0
    expected_fwd = op.apply(u)[0]      # row component
    got = fwd(u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected_fwd),
                               atol=1e-12)
    # adjoint identity through the sharded op
    lhs = float(jnp.vdot(fwd(u), p))
    rhs = float(jnp.vdot(u, adj(p)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


class TestRowShardedPDPS:
    def test_tv_scalar_matches(self, mesh, rng):
        u0 = rng.standard_normal((32, 16))
        f = jnp.asarray(u0)
        model = tv_model()
        ref = denoise_pdps(f, (0.1,), model, maxiter=800)
        got = denoise_pdps_row_sharded(f, (0.1,), model, mesh, maxiter=800)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)

    def test_tv_alpha_map_matches(self, mesh, rng):
        f = jnp.asarray(rng.standard_normal((32, 16)))
        amap = jnp.asarray(rng.uniform(0.01, 0.2, (32, 16)))
        model = tv_model()
        ref = denoise_pdps(f, (amap,), model, maxiter=600)
        got = denoise_pdps_row_sharded(f, (amap,), model, mesh, maxiter=600)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)

    def test_sumregs_matches(self, mesh, rng):
        f = jnp.asarray(rng.standard_normal((32, 16)))
        model = sumregs_model()
        alphas = (0.05, 0.03, 0.02)
        ref = denoise_pdps(f, alphas, model, maxiter=600)
        got = denoise_pdps_row_sharded(f, alphas, model, mesh, maxiter=600)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)

    def test_indivisible_raises(self, mesh):
        with pytest.raises(ValueError):
            denoise_pdps_row_sharded(jnp.zeros((30, 16)), (0.1,), tv_model(),
                                     mesh)


# ---------------------------------------------------------------------------
# 2-D mesh: data parallel (batch) x spatial (rows) composition
# ---------------------------------------------------------------------------

from bpldenoising_tpu.parallel import make_batch_rows_mesh
from bpldenoising_tpu.parallel.halo import denoise_pdps_batch_row_sharded


class TestBatchRowSharded:
    @pytest.mark.parametrize("shape2d", [(2, 4), (4, 2)],
                             ids=["2x4", "4x2"])
    def test_matches_single_device(self, shape2d, rng):
        nb, nr = shape2d
        mesh2d = make_batch_rows_mesh(nb, nr)
        f = jnp.asarray(rng.standard_normal((4, 32, 16)))
        u = denoise_pdps_batch_row_sharded(f, (0.1,), tv_model(), mesh2d,
                                           maxiter=120)
        u_ref = denoise_pdps(f, (0.1,), tv_model(), maxiter=120)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-12)

    def test_sumregs_alpha_map(self, rng):
        mesh2d = make_batch_rows_mesh(2, 4)
        f = jnp.asarray(rng.standard_normal((2, 32, 16)))
        amap = jnp.asarray(0.05 + 0.02 * rng.uniform(size=(32, 16)))
        alphas = (amap, 0.03, 0.01)
        u = denoise_pdps_batch_row_sharded(f, alphas, sumregs_model(),
                                           mesh2d, maxiter=100)
        u_ref = denoise_pdps(f, alphas, sumregs_model(), maxiter=100)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-12)

    def test_indivisible_raises(self):
        mesh2d = make_batch_rows_mesh(2, 4)
        with pytest.raises(ValueError, match="batch 3"):
            denoise_pdps_batch_row_sharded(jnp.zeros((3, 32, 16)), (0.1,),
                                           tv_model(), mesh2d)
        with pytest.raises(ValueError, match="rows 30"):
            denoise_pdps_batch_row_sharded(jnp.zeros((2, 30, 16)), (0.1,),
                                           tv_model(), mesh2d)


# ---------------------------------------------------------------------------
# TGV² family: row-sharded joint-primal CP (spatial decomposition for the
# beyond-reference second-order model)
# ---------------------------------------------------------------------------

from bpldenoising_tpu.parallel.halo import (
    tgv_denoise_pdps_batch_row_sharded, tgv_denoise_pdps_row_sharded)
from bpldenoising_tpu.solvers.tgv import tgv_denoise_pdps


class TestRowShardedTGV:
    def test_scalar_matches(self, mesh, rng):
        f = jnp.asarray(rng.standard_normal((32, 16)))
        u_ref, w_ref = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=600)
        u, w = tgv_denoise_pdps_row_sharded(f, 0.1, 0.2, mesh, maxiter=600)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=1e-10)

    def test_alpha_map_matches(self, mesh, rng):
        f = jnp.asarray(rng.standard_normal((32, 16)))
        a1 = jnp.asarray(rng.uniform(0.05, 0.2, (32, 16)))
        a0 = jnp.asarray(rng.uniform(0.05, 0.3, (32, 16)))
        u_ref, _ = tgv_denoise_pdps(f, a1, a0, maxiter=400)
        u, _ = tgv_denoise_pdps_row_sharded(f, a1, a0, mesh, maxiter=400)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)

    def test_indivisible_raises(self, mesh):
        with pytest.raises(ValueError, match="rows 30"):
            tgv_denoise_pdps_row_sharded(jnp.zeros((30, 16)), 0.1, 0.2,
                                         mesh)

    def test_batch_rows_matches(self, rng):
        mesh2d = make_batch_rows_mesh(2, 4)
        f = jnp.asarray(rng.standard_normal((4, 32, 16)))
        u_ref, w_ref = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=200)
        u, w = tgv_denoise_pdps_batch_row_sharded(f, 0.1, 0.2, mesh2d,
                                                  maxiter=200)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                                   atol=1e-10)


class TestRowShardedVTV:
    def test_scalar_matches(self, mesh, rng):
        from bpldenoising_tpu.parallel.halo import (
            vtv_denoise_pdps_row_sharded)
        from bpldenoising_tpu.solvers.pdps import vtv_denoise
        f = jnp.asarray(rng.standard_normal((3, 32, 16)))
        u_ref = vtv_denoise(f, 0.1, maxiter=400)
        u = vtv_denoise_pdps_row_sharded(f, 0.1, mesh, maxiter=400)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)

    def test_alpha_map_matches(self, mesh, rng):
        from bpldenoising_tpu.parallel.halo import (
            vtv_denoise_pdps_row_sharded)
        from bpldenoising_tpu.solvers.pdps import vtv_denoise
        f = jnp.asarray(rng.standard_normal((3, 32, 16)))
        amap = jnp.asarray(0.05 + 0.1 * rng.uniform(size=(32, 16)))
        u_ref = vtv_denoise(f, amap, maxiter=300)
        u = vtv_denoise_pdps_row_sharded(f, amap, mesh, maxiter=300)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)

    def test_indivisible_raises(self, mesh):
        from bpldenoising_tpu.parallel.halo import (
            vtv_denoise_pdps_row_sharded)
        with pytest.raises(ValueError, match="rows 30"):
            vtv_denoise_pdps_row_sharded(jnp.zeros((3, 30, 16)), 0.1, mesh)

    def test_batch_rows_matches(self, rng):
        from bpldenoising_tpu.parallel import make_batch_rows_mesh
        from bpldenoising_tpu.parallel.halo import (
            vtv_denoise_pdps_batch_row_sharded)
        from bpldenoising_tpu.solvers.pdps import vtv_denoise
        mesh2d = make_batch_rows_mesh(2, 4)
        f = jnp.asarray(rng.standard_normal((4, 3, 32, 16)))
        u_ref = vtv_denoise(f, 0.1, maxiter=200)
        u = vtv_denoise_pdps_batch_row_sharded(f, 0.1, mesh2d, maxiter=200)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)


class TestRowShardedTVL1:
    def test_scalar_matches(self, mesh, rng):
        from bpldenoising_tpu.parallel.halo import tvl1_denoise_row_sharded
        from bpldenoising_tpu.solvers.tvl1 import tvl1_denoise
        f = jnp.asarray(rng.standard_normal((32, 16)))
        u_ref = tvl1_denoise(f, 0.4, maxiter=400)
        u = tvl1_denoise_row_sharded(f, 0.4, mesh, maxiter=400)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)

    def test_alpha_map_matches(self, mesh, rng):
        from bpldenoising_tpu.parallel.halo import tvl1_denoise_row_sharded
        from bpldenoising_tpu.solvers.tvl1 import tvl1_denoise
        f = jnp.asarray(rng.standard_normal((32, 16)))
        amap = jnp.asarray(0.2 + 0.4 * rng.uniform(size=(32, 16)))
        u_ref = tvl1_denoise(f, amap, maxiter=300)
        u = tvl1_denoise_row_sharded(f, amap, mesh, maxiter=300)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)

    def test_indivisible_raises(self, mesh):
        from bpldenoising_tpu.parallel.halo import tvl1_denoise_row_sharded
        with pytest.raises(ValueError, match="rows 30"):
            tvl1_denoise_row_sharded(jnp.zeros((30, 16)), 0.4, mesh)

    def test_batch_rows_matches(self, rng):
        from bpldenoising_tpu.parallel import make_batch_rows_mesh
        from bpldenoising_tpu.parallel.halo import (
            tvl1_denoise_batch_row_sharded)
        from bpldenoising_tpu.solvers.tvl1 import tvl1_denoise
        mesh2d = make_batch_rows_mesh(2, 4)
        f = jnp.asarray(rng.standard_normal((4, 32, 16)))
        u_ref = tvl1_denoise(f, 0.4, maxiter=200)
        u = tvl1_denoise_batch_row_sharded(f, 0.4, mesh2d, maxiter=200)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=1e-10)
