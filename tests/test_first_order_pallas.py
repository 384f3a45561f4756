"""One-kernel single-loop learner vs the jnp scan oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel.first_order import single_loop_tv_learn
from bpldenoising_tpu.bilevel.first_order_pallas import single_loop_tv_pallas


def small_ds(rng, n=16, O=2, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = np.stack([clean] * O)
    noisy = true_ + sigma * rng.standard_normal((O, n, n))
    return jnp.asarray(true_), jnp.asarray(noisy)


def test_matches_jnp_scan(rng):
    utrue, f = small_ds(rng)
    kw = dict(alpha0=0.02, outer=40, n_inner=15, n_adj=5, lr=0.05)
    ref = single_loop_tv_learn(utrue, f, **kw)
    alpha, u, traj = single_loop_tv_pallas(utrue, f, interpret=True, **kw)
    np.testing.assert_allclose(float(alpha), float(ref.alpha), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj),
                               np.asarray(ref.alpha_trajectory), rtol=1e-10)


def test_single_image(rng):
    utrue, f = small_ds(rng, O=1)
    alpha, u, traj = single_loop_tv_pallas(
        utrue[0], f[0], alpha0=0.02, outer=20, n_inner=10, n_adj=4,
        interpret=True)
    assert np.isfinite(float(alpha)) and float(alpha) > 0
    assert u.shape == (16, 16)     # 2-D in → 2-D out (matches the jnp path)


def test_vmem_guard_raises_for_large_problems(rng):
    """Batches beyond VMEM auto-route to the tiled kernel; only a single
    image too large for one tile (the tiled kernel tiles the batch, not
    the plane) raises — for any parameterization."""
    huge = jnp.zeros((1, 4096, 4096))
    with pytest.raises(ValueError, match="too large"):
        single_loop_tv_pallas(huge, huge, interpret=True)
    with pytest.raises(ValueError, match="too large"):
        single_loop_pallas(huge, huge, jnp.full((2, 2), 0.02), tv_model(),
                           interpret=True)


def test_auto_routing_to_tiled(rng, monkeypatch):
    """An oversized scalar-TV batch must route to the tiled kernel and
    produce the same answer the tiled entry point gives directly."""
    import bpldenoising_tpu.bilevel.first_order_pallas as fop
    # force the route: persist never fits, whole-batch recompute (96 KB
    # at 3x16^2 f64) doesn't fit, but one 2-image tile (80 KB) does
    monkeypatch.setattr(fop, "_PERSIST_BUDGET", 1)
    monkeypatch.setattr(fop, "_VMEM_BUDGET", 80 * 1024)
    utrue, f = small_ds(rng, O=3)
    kw = dict(outer=10, n_inner=6, n_adj=3, lr=0.05)
    x, u, _ = fop.single_loop_pallas(utrue, f, 0.02, tv_model(),
                                     interpret=True, **kw)
    x_t, u_t, _ = fop.single_loop_pallas_tiled(utrue, f, 0.02, tv_model(),
                                               interpret=True, **kw)
    np.testing.assert_allclose(float(x), float(x_t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_t), atol=1e-12)


# ---------------------------------------------------------------------------
# Round 2: all four parameterizations vs the jnp scan oracle
# ---------------------------------------------------------------------------

from bpldenoising_tpu.bilevel.first_order import single_loop_learn
from bpldenoising_tpu.bilevel.first_order_pallas import single_loop_pallas
from bpldenoising_tpu.models import sumregs_model, tv_model


@pytest.mark.parametrize("model_fn,x0_fn", [
    (tv_model, lambda: 0.02),
    (tv_model, lambda: jnp.full((2, 2), 0.02)),
    (sumregs_model, lambda: jnp.asarray([0.02, 0.015, 0.01])),
    (sumregs_model, lambda: jnp.full((2, 2, 3), 0.02)),
], ids=["tv-scalar", "tv-patch", "sumregs-vec", "sumregs-patch"])
def test_all_parameterizations_match_oracle(rng, model_fn, x0_fn):
    utrue, f = small_ds(rng)
    model = model_fn()
    x0 = x0_fn()
    kw = dict(outer=25, n_inner=10, n_adj=4, lr=0.05)
    ref = single_loop_learn(utrue, f, x0, model, **kw)
    x, u, traj = single_loop_pallas(utrue, f, x0, model, interpret=True,
                                    **kw)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.alpha),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-9)
    x0a = np.asarray(x0)
    if x0a.ndim == 0:
        np.testing.assert_allclose(np.asarray(traj),
                                   np.asarray(ref.alpha_trajectory),
                                   rtol=1e-9)
    else:
        np.testing.assert_allclose(np.asarray(traj),
                                   np.asarray(ref.cost_trajectory),
                                   rtol=1e-8)


def test_patch_upsample_matmul_equals_patchop(rng):
    """The MXU block-indicator matmuls must reproduce PatchOp exactly
    (PatchOp requires divisible ratios; a non-square anisotropic case)."""
    from bpldenoising_tpu.ops import PatchOp
    m, n, M, N = 4, 2, 20, 16
    pop = PatchOp((m, n), (M, N))
    z = jnp.asarray(rng.standard_normal((m, n)))
    rows = np.minimum(np.arange(M) * m // M, m - 1)
    cols = np.minimum(np.arange(N) * n // N, n - 1)
    Pr = jnp.asarray(np.eye(m)[rows])
    Pc = jnp.asarray(np.eye(n)[cols])
    up = Pr @ z @ Pc.T
    np.testing.assert_allclose(np.asarray(up), np.asarray(pop.apply(z)),
                               atol=1e-14)
    g = jnp.asarray(rng.standard_normal((M, N)))
    down = Pr.T @ g @ Pc
    np.testing.assert_allclose(np.asarray(down),
                               np.asarray(pop.apply_adjoint(g)), atol=1e-12)


# ---------------------------------------------------------------------------
# Recompute mode: smaller VMEM peak, bit-identical results
# ---------------------------------------------------------------------------

def test_recompute_mode_matches_persist(rng):
    """persist=False recomputes the adjoint-system pieces from u per CG
    step; the values are the same ops re-executed, so results must match
    the persistent form to machine precision."""
    from bpldenoising_tpu.models import sumregs_model
    utrue, f = small_ds(rng)
    x0 = jnp.asarray([0.02, 0.015, 0.01])
    kw = dict(outer=20, n_inner=8, n_adj=4, lr=0.05, interpret=True)
    xp, up, _ = single_loop_pallas(utrue, f, x0, sumregs_model(),
                                   persist=True, **kw)
    xr, ur, _ = single_loop_pallas(utrue, f, x0, sumregs_model(),
                                   persist=False, **kw)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ur), np.asarray(up), atol=1e-12)


def test_auto_persist_fits_faces_sumregs():
    """batch-10 K=3 at 128^2 f32 (the flagship faces sumregs workload)
    must be accepted by the guard (round-1 VERDICT: it was rejected) —
    it lands in recompute mode, which measured faster than the
    persistent form past the 16 MiB envelope.  Larger problems degrade
    gracefully: recompute up to the raised budget, then the guard
    raises."""
    from bpldenoising_tpu.bilevel.first_order_pallas import _choose_persist
    f = jnp.zeros((10, 128, 128), jnp.float32)
    assert _choose_persist(f, K=3, extra_patch_bytes=0) is False
    # scalar TV at the same size keeps the fast persistent form
    assert _choose_persist(f, K=1, extra_patch_bytes=0) is True
    f16 = jnp.zeros((16, 128, 128), jnp.float32)
    assert _choose_persist(f16, K=3, extra_patch_bytes=0) is False
    # past the resident budget the caller routes to the tiled kernel
    with pytest.raises(ValueError, match="too large"):
        _choose_persist(jnp.zeros((32, 128, 128), jnp.float32), K=3,
                        extra_patch_bytes=0)


def test_tile_batch_budgets_patch_bytes():
    """ADVICE r2: patch-operator scratch bytes must come out of the tile
    budget, not on top of it — otherwise patch problems get tiles whose
    working set exceeds the 8 MiB target."""
    from bpldenoising_tpu.bilevel.first_order_pallas import (
        _patch_extra_bytes, _tile_batch, _TILE_BUDGET)
    B, M, N, K = 64, 128, 128, 3
    plain = _tile_batch(B, M, N, K, 4)
    patch_bytes = _patch_extra_bytes(M, N, 64, 64, K, 4)
    tight = _tile_batch(B, M, N, K, 4, fixed_bytes=patch_bytes)
    assert 1 <= tight <= plain
    # the fixed overhead plus the per-tile planes stay within the budget
    # whenever the budget admits at least one image
    planes_bytes = plain and (plain * M * N * 4)
    if tight < plain:
        from bpldenoising_tpu.bilevel.first_order_pallas import _vmem_planes
        planes = _vmem_planes(K, persist=False) + (2 * K + 2)
        assert tight * planes * M * N * 4 + patch_bytes <= _TILE_BUDGET
    # degenerate: overhead swallowing the budget still yields 1, not 0
    assert _tile_batch(B, M, N, K, 4, fixed_bytes=10 * _TILE_BUDGET) == 1


# ---------------------------------------------------------------------------
# Batch-tiled one-kernel learner (HBM-carried state)
# ---------------------------------------------------------------------------

from bpldenoising_tpu.bilevel.first_order_pallas import (
    single_loop_pallas_tiled)


class TestTiledLearner:
    def test_single_tile_matches_scan(self, rng):
        """With one tile the kernel is the resident algorithm verbatim
        (same ops, same global CG dots) — match to roundoff."""
        utrue, f = small_ds(rng, O=4)
        kw = dict(outer=25, n_inner=10, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, 0.02, tv_model(), **kw)
        x, u, traj = single_loop_pallas_tiled(
            utrue, f, 0.02, tv_model(), tile_b=4, interpret=True, **kw)
        np.testing.assert_allclose(float(x), float(ref.alpha), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(traj),
                                   np.asarray(ref.alpha_trajectory),
                                   rtol=1e-10)

    def test_single_image_tiles_match_scan(self, rng):
        """With one image per tile AND one image total, per-tile CG dots
        equal the oracle's global dots — exact again."""
        utrue, f = small_ds(rng, O=1)
        kw = dict(outer=20, n_inner=8, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, 0.02, tv_model(), **kw)
        x, u, _ = single_loop_pallas_tiled(
            utrue, f, 0.02, tv_model(), tile_b=1, interpret=True, **kw)
        np.testing.assert_allclose(float(x), float(ref.alpha), rtol=1e-10)

    @pytest.mark.parametrize("tile_b", [1, 2, 3], ids=lambda t: f"tb{t}")
    def test_multi_tile_converges_to_same_optimum(self, rng, tile_b):
        """Per-tile CG dots (documented deviation) still reach the scan's
        optimum within adjoint-solver tolerance; tile_b=3 also exercises
        the zero-padded remainder tile."""
        utrue, f = small_ds(rng, O=5)
        kw = dict(outer=40, n_inner=12, n_adj=15, lr=0.05)
        ref = single_loop_learn(utrue, f, 0.02, tv_model(), **kw)
        x, u, _ = single_loop_pallas_tiled(
            utrue, f, 0.02, tv_model(), tile_b=tile_b, interpret=True, **kw)
        np.testing.assert_allclose(float(x), float(ref.alpha), rtol=2e-3)

    def test_deviation_vanishes_with_adjoint_convergence(self, rng):
        """The tiled/scan trajectory gap is adjoint inexactness (per-tile
        vs batch-global CG dots on the same block-diagonal system): it
        must shrink as n_adj grows."""
        utrue, f = small_ds(rng, O=5)
        gaps = []
        for n_adj in (5, 30):
            kw = dict(outer=40, n_inner=12, n_adj=n_adj, lr=0.05)
            ref = single_loop_learn(utrue, f, 0.02, tv_model(), **kw)
            x, _, _ = single_loop_pallas_tiled(
                utrue, f, 0.02, tv_model(), tile_b=2, interpret=True, **kw)
            gaps.append(abs(float(x) - float(ref.alpha))
                        / float(ref.alpha))
        assert gaps[1] < gaps[0] / 10
        assert gaps[1] < 1e-3

    def test_sumregs_vector(self, rng):
        utrue, f = small_ds(rng, O=4)
        from bpldenoising_tpu.models import sumregs_model
        x0 = jnp.asarray([0.02, 0.015, 0.01])
        kw = dict(outer=25, n_inner=10, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, x0, sumregs_model(), **kw)
        # single tile: exact
        x, u, traj = single_loop_pallas_tiled(
            utrue, f, x0, sumregs_model(), tile_b=4, interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref.alpha),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(traj),
                                   np.asarray(ref.cost_trajectory),
                                   rtol=1e-10)
        # two tiles: same optimum within adjoint-solver tolerance
        kw2 = dict(kw, n_adj=15)
        ref2 = single_loop_learn(utrue, f, x0, sumregs_model(), **kw2)
        x2, _, _ = single_loop_pallas_tiled(
            utrue, f, x0, sumregs_model(), tile_b=2, interpret=True, **kw2)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(ref2.alpha),
                                   rtol=5e-3)

    @pytest.mark.parametrize("model_fn,x0_fn", [
        (tv_model, lambda: jnp.full((2, 2), 0.02)),
        (sumregs_model, lambda: jnp.full((2, 2, 3), 0.02)),
    ], ids=["tv-patch", "sumregs-patch"])
    def test_patch_single_tile_matches_scan(self, rng, model_fn, x0_fn):
        """Patch parameterizations run in the tiled kernel too; a single
        tile matches the scan oracle to roundoff."""
        utrue, f = small_ds(rng, O=4)
        model, x0 = model_fn(), x0_fn()
        kw = dict(outer=20, n_inner=8, n_adj=4, lr=0.05)
        ref = single_loop_learn(utrue, f, x0, model, **kw)
        x, u, traj = single_loop_pallas_tiled(
            utrue, f, x0, model, tile_b=4, interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref.alpha),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(traj),
                                   np.asarray(ref.cost_trajectory),
                                   rtol=1e-10)

    def test_patch_multi_tile_converges(self, rng):
        utrue, f = small_ds(rng, O=4)
        x0 = jnp.full((2, 2), 0.02)
        kw = dict(outer=30, n_inner=10, n_adj=15, lr=0.05)
        ref = single_loop_learn(utrue, f, x0, tv_model(), **kw)
        x, _, _ = single_loop_pallas_tiled(
            utrue, f, x0, tv_model(), tile_b=2, interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref.alpha),
                                   rtol=5e-3)


def test_explicit_persist_still_guarded(rng):
    """An explicit persist=True/False must not bypass the size guard
    (review finding): oversized problems raise the documented ValueError
    instead of reaching Mosaic."""
    big = jnp.zeros((64, 256, 256))
    for persist in (True, False):
        with pytest.raises(ValueError, match="too large"):
            single_loop_tv_pallas(big, big, persist=persist, interpret=True)


def test_tiled_single_image_guard():
    """Direct tiled calls with an image too large for one tile raise
    cleanly (batch tiling cannot split the image plane)."""
    huge = jnp.zeros((2, 4096, 4096))
    with pytest.raises(ValueError, match="single\\s*\nimage|single image"):
        single_loop_pallas_tiled(huge, huge, 0.1, tv_model(),
                                 interpret=True)
