"""Fused TGV² Pallas kernel vs the jnp oracle (interpret mode on CPU):
forward agreement, warm-start chaining, in-kernel early stop, batching /
grid chunking, the diff layer's pallas backend, and input validation."""

import jax.numpy as jnp
import numpy as np
import pytest

import bpldenoising_tpu.solvers.tgv_pallas as tp
from bpldenoising_tpu.solvers.tgv import make_diff_tgv_denoise, \
    tgv_denoise_pdps
from bpldenoising_tpu.solvers.tgv_pallas import tgv_denoise_pdps_pallas

MAXITER = 300


def stack(rng, O=3, n=16, dtype=jnp.float32):
    clean = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n), (n, n))
    return jnp.asarray(clean + 0.1 * rng.standard_normal((O, n, n)), dtype)


def test_matches_jnp_oracle(rng):
    f = stack(rng)
    u0, w0 = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=MAXITER)
    u1, w1 = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=5e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=5e-6)


def test_matches_jnp_oracle_f64(rng):
    f = stack(rng, dtype=jnp.float64)
    u0, w0 = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=MAXITER)
    u1, w1 = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=1e-13)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-13)


def test_single_image_squeeze(rng):
    f = stack(rng, O=1)[0]
    u0, w0 = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=MAXITER)
    u1, w1 = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER,
                                     interpret=True)
    assert u1.shape == f.shape and w1.shape == (2,) + f.shape
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=5e-6)


def test_warm_start_chains_exactly(rng):
    f = stack(rng)
    u_full, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER,
                                        interpret=True)
    u_h, w_h, state = tgv_denoise_pdps_pallas(
        f, 0.1, 0.2, maxiter=MAXITER // 2, return_state=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(u_h),
                               atol=0)
    u_res, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER // 2,
                                       state0=state, interpret=True)
    np.testing.assert_allclose(np.asarray(u_res), np.asarray(u_full),
                               atol=0)


def test_warm_start_interops_with_jnp_state(rng):
    """State from the jnp solver warm-starts the kernel (same layout)."""
    f = stack(rng)
    out = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=MAXITER // 2,
                           return_state=True)
    _, _, state, _ = out
    u_res, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER // 2,
                                       state0=state, interpret=True)
    u_full, _ = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=MAXITER)
    np.testing.assert_allclose(np.asarray(u_res), np.asarray(u_full),
                               atol=5e-6)


def test_early_stop_in_kernel(rng):
    f = stack(rng)
    u_ref, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=4000,
                                       interpret=True)
    u_es, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=4000, tol=1e-4,
                                      check_every=200, interpret=True)
    np.testing.assert_allclose(np.asarray(u_es), np.asarray(u_ref),
                               atol=5e-3)


def test_grid_chunking(rng, monkeypatch):
    """Force a tiny VMEM budget so the batch splits across grid steps
    (including an uneven final chunk); results must not change."""
    f = stack(rng, O=5)
    u_ref, w_ref = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=100,
                                           interpret=True)
    monkeypatch.setattr(tp, "_VMEM_BUDGET",
                        2 * 20 * 16 * 16 * 4 + 1)  # 2 images per chunk
    tp._pallas_impl.clear_cache()
    u_c, w_c = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=100,
                                       interpret=True)
    tp._pallas_impl.clear_cache()
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_ref), atol=0)
    np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_ref), atol=0)


def test_oversize_routes_to_jnp(rng, monkeypatch):
    """Beyond both batch budgets AND the tile plan the dispatcher falls
    back to the jnp path."""
    f = stack(rng, O=2)
    monkeypatch.setattr(tp, "_VMEM_BUDGET", 1)
    monkeypatch.setattr(tp, "_RESIDENT_BUDGET", 1)
    monkeypatch.setattr(tp, "_tgv_tile_plan", lambda *a, **k: None)
    tp._pallas_impl.clear_cache()
    u, w = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=100)
    tp._pallas_impl.clear_cache()
    u0, w0 = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=100)
    # same math under a different jit scope: f32 fusion-order rounding only
    np.testing.assert_allclose(np.asarray(u), np.asarray(u0), atol=1e-6)


def test_diff_layer_pallas_backend(rng):
    """make_diff_tgv_denoise(backend='pallas') forward = jnp forward, and
    the implicit gradient agrees between backends."""
    import jax
    clean = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 12), (12, 12))
    f = jnp.asarray(clean + 0.1 * rng.standard_normal((12, 12)))
    s_jnp = make_diff_tgv_denoise(maxiter=MAXITER, backend="jnp")
    s_pal = make_diff_tgv_denoise(maxiter=MAXITER, backend="pallas",
                                  interpret=True)
    a = (jnp.asarray(0.1), jnp.asarray(0.2))

    def loss(solve, alphas):
        return 0.5 * jnp.sum((solve(f, alphas) - clean) ** 2)

    l0, g0 = jax.value_and_grad(lambda al: loss(s_jnp, al))(a)
    l1, g1 = jax.value_and_grad(lambda al: loss(s_pal, al))(a)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)


def test_map_alpha_constant_matches_scalar(rng):
    """(M, N) maps filled with a constant must reproduce the scalar-weight
    kernel exactly (same iteration, weights broadcast per pixel)."""
    f = stack(rng)
    u0, w0 = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=MAXITER,
                                     interpret=True)
    u1, w1 = tgv_denoise_pdps_pallas(f, jnp.full((16, 16), 0.1),
                                     jnp.full((16, 16), 0.2),
                                     maxiter=MAXITER, interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-7)


def test_map_alpha_matches_jnp_oracle(rng):
    """Genuinely varying per-pixel weights vs the jnp map-α oracle —
    including a mixed scalar/map pair (the scalar broadcasts in-kernel)."""
    f = stack(rng, dtype=jnp.float64)
    a1 = jnp.asarray(0.05 + 0.1 * rng.random((16, 16)))
    a0 = jnp.asarray(0.05 + 0.2 * rng.random((16, 16)))
    u0, w0 = tgv_denoise_pdps(f, a1, a0, maxiter=MAXITER)
    u1, w1 = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=MAXITER,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=1e-13)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-13)
    u0m, _ = tgv_denoise_pdps(f, a1, 0.2, maxiter=MAXITER)
    u1m, _ = tgv_denoise_pdps_pallas(f, a1, 0.2, maxiter=MAXITER,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(u1m), np.asarray(u0m),
                               atol=1e-13)


def test_map_alpha_warm_start_and_early_stop(rng):
    f = stack(rng)
    a1 = jnp.full((16, 16), 0.1)
    a0 = jnp.asarray(0.1 + 0.2 * rng.random((16, 16)), jnp.float32)
    u_full, _ = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=MAXITER,
                                        interpret=True)
    _, _, state = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=MAXITER // 2,
                                          return_state=True, interpret=True)
    u_res, _ = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=MAXITER // 2,
                                       state0=state, interpret=True)
    np.testing.assert_allclose(np.asarray(u_res), np.asarray(u_full),
                               atol=1e-6)
    u_ref, _ = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=4000,
                                       interpret=True)
    u_es, _ = tgv_denoise_pdps_pallas(f, a1, a0, maxiter=4000, tol=1e-4,
                                      check_every=200, interpret=True)
    np.testing.assert_allclose(np.asarray(u_es), np.asarray(u_ref),
                               atol=5e-3)


# ---------------------------------------------------------------------------
# Spatially-tiled TGV kernel (images beyond the whole-image VMEM budget)
# ---------------------------------------------------------------------------

from bpldenoising_tpu.solvers.tgv_pallas import _tgv_tile_plan, _tiled_impl


def test_tiled_exact_vs_oracle(rng):
    """The halo-chunk scheme (T-iteration chunks, halo H=2T) is EXACT for
    the joint-primal TGV iteration (stencil reach 2 rows/iteration)."""
    f = jnp.asarray(rng.standard_normal((2, 40, 16)), jnp.float64)
    u_ref, w_ref = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=100)
    u_t, w_t = _tiled_impl(f, jnp.asarray(0.1), jnp.asarray(0.2),
                           tau0=0.99, sigma0=0.99, maxiter=100, tol=None,
                           check_every=500, tile_rows=16, chunk_iters=3,
                           return_state=False, interpret=True)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(w_t), np.asarray(w_ref),
                               atol=1e-13)


def test_tiled_map_alpha_and_state(rng):
    f = jnp.asarray(rng.standard_normal((1, 40, 16)), jnp.float64)
    a1 = jnp.asarray(rng.uniform(0.05, 0.2, (40, 16)))
    a0 = jnp.asarray(rng.uniform(0.05, 0.3, (40, 16)))
    u_ref, w_ref, st_ref, _ = tgv_denoise_pdps(f, a1, a0, maxiter=60,
                                               return_state=True)
    u_t, w_t, st = _tiled_impl(f, a1, a0, tau0=0.99, sigma0=0.99,
                               maxiter=60, tol=None, check_every=500,
                               tile_rows=16, chunk_iters=4,
                               return_state=True, interpret=True)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)
    for a, b in zip(st, st_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)


def test_tiled_warm_start_and_tol(rng):
    f = jnp.asarray(rng.standard_normal((1, 40, 16)), jnp.float64)
    _, _, st1, _ = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=80,
                                    return_state=True)
    u_t, _ = _tiled_impl(f, jnp.asarray(0.12), jnp.asarray(0.2),
                         tuple(st1), tau0=0.99, sigma0=0.99, maxiter=40,
                         tol=None, check_every=500, tile_rows=16,
                         chunk_iters=4, return_state=False, interpret=True)
    u_ref, _ = tgv_denoise_pdps(f, 0.12, 0.2, maxiter=40, state0=st1)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)

    u_star, _ = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=20000)
    u_tol, _ = _tiled_impl(f, jnp.asarray(0.1), jnp.asarray(0.2),
                           tau0=0.99, sigma0=0.99, maxiter=20000, tol=1e-9,
                           check_every=100, tile_rows=16, chunk_iters=10,
                           return_state=False, interpret=True)
    np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_star),
                               atol=1e-5)


def test_auto_routing_to_tiled(rng, monkeypatch):
    """Oversized images route to the tiled TGV kernel before the jnp
    fallback."""
    calls = {}
    orig = tp._tiled_impl

    def spy(*a, **k):
        calls["tiled"] = True
        return orig(*a, **k)

    monkeypatch.setattr(tp, "_tiled_impl", spy)
    monkeypatch.setattr(tp, "_chunk_size", lambda *a, **k: 0)
    monkeypatch.setattr(tp, "_tgv_tile_plan", lambda *a, **k: (16, 3))
    f = stack(rng, O=1)
    u, _ = tgv_denoise_pdps_pallas(f, 0.1, 0.2, maxiter=30, interpret=True)
    u_ref, _ = tgv_denoise_pdps(f, 0.1, 0.2, maxiter=30)
    assert calls.get("tiled")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=5e-6)


def test_tgv_tile_plan_properties():
    plan = _tgv_tile_plan(1024, 1024, 4)
    assert plan is not None
    tile, T = plan
    assert tile % 8 == 0 and tile >= 2 * (2 * T)
    assert _tgv_tile_plan(4096, 65536, 8) is None  # absurd width: no plan


def test_rejects_bad_alpha_shape(rng):
    f = stack(rng)
    with pytest.raises(ValueError, match="map"):
        tgv_denoise_pdps_pallas(f, jnp.ones((8, 8)), 0.2, maxiter=10,
                                interpret=True)
    with pytest.raises(ValueError, match="scalar or an"):
        tgv_denoise_pdps_pallas(f, jnp.ones((3,)), 0.2, maxiter=10,
                                interpret=True)
