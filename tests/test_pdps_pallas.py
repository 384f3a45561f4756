"""Pallas fused-PDPS kernel vs the jnp oracle (interpret mode on CPU;
the same kernel compiles via Mosaic on real TPU — exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.solvers.pdps_pallas import denoise_pdps_pallas

ITERS = 200


def noisy(rng, shape=(16, 16), sigma=0.1):
    x, y = np.meshgrid(np.arange(shape[-1]), np.arange(shape[-2]))
    clean = ((x - shape[-1] / 2) ** 2 + (y - shape[-2] / 2) ** 2
             < (shape[-2] / 3) ** 2).astype(np.float64)
    return jnp.asarray(clean + sigma * rng.standard_normal(shape))


@pytest.mark.parametrize("model_fn,alphas", [
    (tv_model, (0.1,)),
    (sumregs_model, (0.05, 0.03, 0.02)),
], ids=["tv", "sumregs"])
def test_matches_jnp_oracle(rng, model_fn, alphas):
    model = model_fn()
    f = noisy(rng)
    u_ref = denoise_pdps(f, alphas, model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, alphas, model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_batch_matches(rng):
    model = tv_model()
    f = jnp.stack([noisy(rng), noisy(rng), noisy(rng)])
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                interpret=True)
    assert u_pal.shape == f.shape
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_alpha_map_matches(rng):
    model = tv_model()
    f = noisy(rng)
    amap = jnp.asarray(rng.uniform(0.01, 0.2, (16, 16)))
    u_ref = denoise_pdps(f, (amap,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (amap,), model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_unaccelerated(rng):
    model = tv_model()
    f = noisy(rng)
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS, accel=False)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                accel=False, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_multi_grid_steps(rng, monkeypatch):
    """Batch larger than the VMEM chunk exercises grid>1 + padding."""
    import bpldenoising_tpu.solvers.pdps_pallas as pp
    monkeypatch.setattr(pp, "_vmem_chunk",
                        lambda O, M, N, K, sz, **kw: 2)
    model = tv_model()
    f = jnp.stack([noisy(rng) for _ in range(5)])  # 5 images, chunk 2 → grid 3
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = pp.denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                   interpret=True)
    assert u_pal.shape == f.shape
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_non_square_image(rng):
    model = tv_model()
    f = noisy(rng, shape=(24, 16))
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


# ---------------------------------------------------------------------------
# Early stopping + warm-start state chaining (round-2 kernel features)
# ---------------------------------------------------------------------------

def test_tol_early_stop_matches_converged(rng):
    """In-kernel chunked early stop lands within tol of the fully-converged
    fixed-point (jnp oracle at a large fixed budget)."""
    model = tv_model()
    f = jnp.stack([noisy(rng) for _ in range(3)])
    u_star = denoise_pdps(f, (0.1,), model, maxiter=20000)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=20000, tol=1e-9,
                                check_every=100, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_star),
                               atol=1e-6)


def test_tol_respects_maxiter(rng):
    """With an unreachable tol, the chunked loop must still cap at maxiter
    (and clamp the final partial chunk) — matching the fixed-budget run."""
    model = tv_model()
    f = noisy(rng)
    u_fixed = denoise_pdps_pallas(f, (0.1,), model, maxiter=250,
                                  interpret=True)
    u_tol = denoise_pdps_pallas(f, (0.1,), model, maxiter=250, tol=1e-30,
                                check_every=100, interpret=True)
    np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_fixed),
                               atol=1e-12)


@pytest.mark.parametrize("model_fn,alphas,alphas2", [
    (tv_model, (0.1,), (0.12,)),
    (sumregs_model, (0.05, 0.03, 0.02), (0.06, 0.03, 0.02)),
], ids=["tv", "sumregs"])
def test_state_chaining_matches_jnp(rng, model_fn, alphas, alphas2):
    """return_state → state0 chaining reproduces the jnp path's warm start
    exactly (same (u, ys) format at the interface)."""
    model = model_fn()
    f = jnp.stack([noisy(rng) for _ in range(2)])
    u1p, st = denoise_pdps_pallas(f, alphas, model, maxiter=ITERS,
                                  return_state=True, interpret=True)
    u1j, ysj, _ = denoise_pdps(f, alphas, model, maxiter=ITERS,
                               return_dual=True)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(u1j), atol=1e-10)
    for a, b in zip(st[1], ysj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    u2p = denoise_pdps_pallas(f, alphas2, model, maxiter=100, state0=st,
                              interpret=True)
    u2j = denoise_pdps(f, alphas2, model, maxiter=100, state0=(u1j, ysj))
    np.testing.assert_allclose(np.asarray(u2p), np.asarray(u2j), atol=1e-10)


def test_warm_start_converges_faster(rng):
    """A warm start at nearby α reaches the new fixed point within far
    fewer iterations than the cold budget needs."""
    model = tv_model()
    f = noisy(rng)
    u_star = denoise_pdps(f, (0.12,), model, maxiter=20000)
    _, st = denoise_pdps_pallas(f, (0.1,), model, maxiter=2000,
                                return_state=True, interpret=True)
    u_warm = denoise_pdps_pallas(f, (0.12,), model, maxiter=300, state0=st,
                                 interpret=True)
    u_cold = denoise_pdps_pallas(f, (0.12,), model, maxiter=300,
                                 interpret=True)
    err_warm = float(jnp.max(jnp.abs(u_warm - u_star)))
    err_cold = float(jnp.max(jnp.abs(u_cold - u_star)))
    assert err_warm < 0.5 * err_cold

    # warm start AT the fixed point stays at the fixed point
    u_star1 = denoise_pdps(f, (0.1,), model, maxiter=20000)
    _, st_star = denoise_pdps_pallas(f, (0.1,), model, maxiter=20000,
                                     return_state=True, interpret=True)
    u_stay = denoise_pdps_pallas(f, (0.1,), model, maxiter=100,
                                 state0=st_star, interpret=True)
    # the restarted accelerated schedule (large initial tau) amplifies the
    # residual convergence error slightly before re-contracting
    assert float(jnp.max(jnp.abs(u_stay - u_star1))) < 3e-5


# ---------------------------------------------------------------------------
# Spatially-tiled kernel (round 2: images beyond the whole-image VMEM budget)
# ---------------------------------------------------------------------------

from bpldenoising_tpu.solvers.pdps_pallas import _tile_plan, _tiled_impl


def test_tiled_exact_vs_oracle(rng):
    """The trapezoid scheme (T-iteration chunks, halo H=2T) is EXACT: every
    tile-interior value has its full dependency cone inside the halo."""
    model = tv_model()
    f = jnp.stack([noisy(rng, shape=(40, 16)) for _ in range(2)])
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=100)
    u_t = _tiled_impl(f, (jnp.asarray(0.1),), model=model, tau0=5.0,
                      sigma0=0.99 / 5.0, gamma=1.0, maxiter=100, accel=True,
                      interpret=True, tile_rows=16, chunk_iters=3)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)


def test_tiled_alpha_map_and_sumregs(rng):
    f = jnp.stack([noisy(rng, shape=(40, 16))])
    model = tv_model()
    amap = jnp.asarray(rng.uniform(0.05, 0.2, (40, 16)))
    u_ref = denoise_pdps(f, (amap,), model, maxiter=60)
    u_t = _tiled_impl(f, (amap,), model=model, tau0=5.0, sigma0=0.99 / 5.0,
                      gamma=1.0, maxiter=60, accel=True, interpret=True,
                      tile_rows=16, chunk_iters=4)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)

    sr = sumregs_model()
    a3 = tuple(jnp.asarray(v) for v in (0.05, 0.03, 0.02))
    u_ref3, ys_ref3, _ = denoise_pdps(f, a3, sr, maxiter=50,
                                      return_dual=True)
    u_t3, st = _tiled_impl(f, a3, model=sr, tau0=5.0, sigma0=0.99 / 5.0,
                           gamma=1.0, maxiter=50, accel=True,
                           interpret=True, tile_rows=16, chunk_iters=5,
                           return_state=True)
    np.testing.assert_allclose(np.asarray(u_t3), np.asarray(u_ref3),
                               atol=1e-13)
    for a, b in zip(st[1], ys_ref3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)


def test_tiled_warm_start_and_tol(rng):
    model = tv_model()
    f = jnp.stack([noisy(rng, shape=(40, 16))])
    u1, ys1, _ = denoise_pdps(f, (0.1,), model, maxiter=80, return_dual=True)
    u_t = _tiled_impl(f, (jnp.asarray(0.12),), (u1, ys1), model=model,
                      tau0=5.0, sigma0=0.99 / 5.0, gamma=1.0, maxiter=40,
                      accel=True, interpret=True, tile_rows=16,
                      chunk_iters=4)
    u_ref = denoise_pdps(f, (0.12,), model, maxiter=40, state0=(u1, ys1))
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                               atol=1e-13)

    # tol: converges to the fixed point within tolerance
    u_star = denoise_pdps(f, (0.1,), model, maxiter=20000)
    u_tol = _tiled_impl(f, (jnp.asarray(0.1),), model=model, tau0=5.0,
                        sigma0=0.99 / 5.0, gamma=1.0, maxiter=20000,
                        accel=True, interpret=True, tile_rows=16,
                        chunk_iters=10, tol=1e-9)
    np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_star),
                               atol=1e-6)


def test_tile_plan_properties():
    """Plans fit the plane cap, and huge images still plan (or cleanly
    decline)."""
    for (Mi, Ni, K) in [(1024, 1024, 1), (2048, 2048, 1), (1024, 1024, 3)]:
        plan = _tile_plan(Mi, Ni, K, 4)
        assert plan is not None
        tile, T = plan
        assert tile >= 2 * (2 * T)
        assert tile % 8 == 0


def test_auto_routing_to_tiled(rng, monkeypatch):
    """denoise_pdps_pallas must route oversized images to the tiled kernel
    (not the jnp fallback) when a tile plan exists."""
    import bpldenoising_tpu.solvers.pdps_pallas as pp
    calls = {}
    orig = pp._tiled_impl

    def spy(*a, **k):
        calls["tiled"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pp, "_tiled_impl", spy)
    monkeypatch.setattr(pp, "_vmem_chunk", lambda *a, **k: 0)
    monkeypatch.setattr(pp, "_tile_plan", lambda *a, **k: (16, 3))
    model = tv_model()
    f = noisy(rng, shape=(40, 16))
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=60)
    u = pp.denoise_pdps_pallas(f, (0.1,), model, maxiter=60, interpret=True)
    assert calls.get("tiled")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-13)


def test_tiled_fuzz_shapes(rng):
    """Random shapes × tile plans × budgets: the trapezoid scheme must be
    exact for every geometry (odd sizes, tail chunks, tile > M, batch)."""
    model = tv_model()
    for _ in range(6):
        O = int(rng.integers(1, 3))
        M = int(rng.integers(12, 48))
        N = int(rng.integers(12, 24))
        T = int(rng.integers(2, 5))
        tile = int(rng.integers(max(4 * T, 8), M + 8))
        iters = int(rng.integers(5, 60))
        f = jnp.asarray(rng.uniform(0, 1, (O, M, N)))
        u_ref = denoise_pdps(f, (0.1,), model, maxiter=iters)
        u_t = _tiled_impl(f, (jnp.asarray(0.1),), model=model, tau0=5.0,
                          sigma0=0.99 / 5.0, gamma=1.0, maxiter=iters,
                          accel=True, interpret=True, tile_rows=tile,
                          chunk_iters=T)
        np.testing.assert_allclose(
            np.asarray(u_t), np.asarray(u_ref), atol=1e-12,
            err_msg=f"O={O} M={M} N={N} tile={tile} T={T} iters={iters}")


def test_resident_budget_routing():
    """Images whose state exceeds the chunking budget but fits the larger
    resident budget run whole-image (chunk=1); beyond that, tiled; the
    f32 K=1 boundary sits between 1024^2 (resident) and 2048^2 (tiled)."""
    import bpldenoising_tpu.solvers.pdps_pallas as pp
    # 1024^2 f32 K=1: 8 planes x 4 MiB = 32 MiB
    assert pp._vmem_chunk(1, 1024, 1024, 1, 4) == 0
    assert pp._vmem_chunk(1, 1024, 1024, 1, 4,
                          budget=pp._RESIDENT_BUDGET) == 1
    # with early-stop (1 extra plane): still resident
    assert pp._vmem_chunk(1, 1024, 1024, 1, 4, extra_planes=1,
                          budget=pp._RESIDENT_BUDGET) == 1
    # 2048^2 f32 K=1: 128 MiB — beyond resident, must tile
    assert pp._vmem_chunk(1, 2048, 2048, 1, 4,
                          budget=pp._RESIDENT_BUDGET) == 0
    assert _tile_plan(2048, 2048, 1, 4) is not None


def test_tiled_early_stop_mask_excludes_pad_and_halo(rng):
    """The tiled tol criterion must measure only owned, in-image rows —
    a padded-rows case (M not divisible by the tile) must stop at the
    same outcome as the jnp criterion on the assembled image."""
    import bpldenoising_tpu.solvers.pdps_pallas as pp
    model = tv_model()
    f = noisy(rng, shape=(44, 16))     # 44 rows, tile 16 -> 4 pad rows
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=400, tol=1e-7,
                         check_every=50)
    u = pp._tiled_impl(
        jnp.asarray(f)[None] if jnp.asarray(f).ndim == 2 else f,
        (jnp.asarray(0.1, f.dtype),), None, model=model, tau0=5.0,
        sigma0=0.99 / 5.0, gamma=1.0, maxiter=400, accel=True,
        interpret=True, tol=1e-7, check_every=50, tile_rows=16,
        chunk_iters=4, return_state=False)
    np.testing.assert_allclose(np.asarray(u[0]), np.asarray(u_ref),
                               atol=5e-7)
