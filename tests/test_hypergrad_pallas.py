"""Fused AL-hypergradient kernel vs the jnp exact_hypergrad (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.solvers.hypergrad import (HypergradConfig,
                                                exact_hypergrad)
from bpldenoising_tpu.solvers.hypergrad_pallas import (
    exact_hypergrad_pallas, hypergrad_pallas_supported)
from bpldenoising_tpu.solvers.pdps import denoise_pdps


def problem(rng, n=16, O=3):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = jnp.asarray(np.stack([clean] * O))
    noisy = true_ + 0.1 * jnp.asarray(rng.standard_normal((O, n, n)))
    return true_, noisy


@pytest.mark.parametrize("model_fn,alphas", [
    (tv_model, (0.08,)),
    (sumregs_model, (0.05, 0.03, 0.01)),
], ids=["tv", "sumregs"])
def test_matches_jnp_exact(rng, model_fn, alphas):
    model = model_fn()
    true_, noisy = problem(rng)
    u = denoise_pdps(noisy, alphas, model, maxiter=2000)
    # budgets chosen so BOTH solvers converge — at a shared unconverged
    # iteration cap the two CG paths differ by trajectory, not by math
    cfg = HypergradConfig(al_iters=2, cg_maxiter=2000, cg_tol=1e-12)
    al = tuple(jnp.asarray(a, u.dtype) for a in alphas)
    g_ref, p_ref, info_ref = exact_hypergrad(u, true_, al, model, cfg)
    g_pal, p_pal, info = exact_hypergrad_pallas(u, true_, al, model, cfg,
                                                interpret=True)
    assert bool(info_ref.converged) and bool(info.converged)
    np.testing.assert_allclose(np.asarray(jnp.stack(g_pal)),
                               np.asarray(jnp.stack(g_ref)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               atol=1e-10)


def test_warm_start_converges_faster(rng):
    """al_iters=1 so the reported iteration count IS the (only) solve the
    warm start accelerates (with multiplier updates the count reflects the
    last AL solve, which already starts warm from the first)."""
    model = tv_model()
    true_, noisy = problem(rng)
    u = denoise_pdps(noisy, (0.08,), model, maxiter=2000)
    cfg = HypergradConfig(al_iters=1, cg_maxiter=2000, cg_tol=1e-10)
    al = (jnp.asarray(0.08, u.dtype),)
    _, p, info_cold = exact_hypergrad_pallas(u, true_, al, model, cfg,
                                             interpret=True)
    _, _, info_warm = exact_hypergrad_pallas(u, true_, al, model, cfg,
                                             p0=p, interpret=True)
    assert int(info_warm.iters) < int(info_cold.iters) // 10


def test_map_alpha_and_want_maps_match_jnp(rng):
    """Patch-family form: per-pixel α map in, per-image gradient maps out
    — must match the jnp solver at convergence."""
    model = tv_model()
    true_, noisy = problem(rng)
    amap = jnp.asarray(0.06 + 0.04 * rng.uniform(size=noisy.shape[-2:]))
    u = denoise_pdps(noisy, (amap,), model, maxiter=2000)
    cfg = HypergradConfig(al_iters=2, cg_maxiter=2000, cg_tol=1e-12)
    al = (jnp.asarray(amap, u.dtype),)
    g_ref, p_ref, _ = exact_hypergrad(u, true_, al, model, cfg,
                                      want_maps=True)
    g_pal, p_pal, info = exact_hypergrad_pallas(u, true_, al, model, cfg,
                                                want_maps=True,
                                                interpret=True)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               atol=1e-10)


def test_mixed_scalar_and_map_alphas(rng):
    """K=3 with one map and two scalars exercises the mixed SMEM/VMEM
    α packing."""
    model = sumregs_model()
    true_, noisy = problem(rng, O=2)
    amap = jnp.asarray(jnp.full(noisy.shape[-2:], 0.05))
    alphas = (amap, jnp.asarray(0.03), jnp.asarray(0.01))
    u = denoise_pdps(noisy, alphas, model, maxiter=1500)
    cfg = HypergradConfig(al_iters=2, cg_maxiter=3000, cg_tol=1e-12)
    g_ref, _, _ = exact_hypergrad(u, true_, alphas, model, cfg)
    g_pal, _, info = exact_hypergrad_pallas(u, true_, alphas, model, cfg,
                                            interpret=True)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(jnp.stack(g_pal)),
                               np.asarray(jnp.stack(g_ref)), rtol=1e-9)


def test_supported_predicate():
    # scalars and 2-D (full-size, caller-upsampled) maps are in-kernel;
    # anything else routes to the jnp path
    assert hypergrad_pallas_supported((jnp.asarray(0.1),))
    assert hypergrad_pallas_supported((jnp.full((16, 16), 0.1),))
    assert not hypergrad_pallas_supported((jnp.ones(3),))


from bpldenoising_tpu.solvers.hypergrad import reg_hypergrad
from bpldenoising_tpu.solvers.hypergrad_pallas import reg_hypergrad_pallas


@pytest.mark.parametrize("model_fn,alphas", [
    (tv_model, (0.08,)),
    (sumregs_model, (0.05, 0.03, 0.01)),
], ids=["tv", "sumregs"])
def test_reg_matches_jnp(rng, model_fn, alphas):
    model = model_fn()
    true_, noisy = problem(rng)
    u = denoise_pdps(noisy, alphas, model, maxiter=2000)
    cfg = HypergradConfig(cg_maxiter=3000, cg_tol=1e-12, gamma=1e6)
    al = tuple(jnp.asarray(a, u.dtype) for a in alphas)
    g_ref, p_ref, info_ref = reg_hypergrad(u, true_, al, model, cfg)
    g_pal, p_pal, info = reg_hypergrad_pallas(u, true_, al, model, cfg,
                                              interpret=True)
    assert bool(info_ref.converged) and bool(info.converged)
    np.testing.assert_allclose(np.asarray(jnp.stack(g_pal)),
                               np.asarray(jnp.stack(g_ref)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               atol=1e-10)


def test_reg_map_alpha_want_maps(rng):
    model = tv_model()
    true_, noisy = problem(rng)
    amap = jnp.asarray(0.06 + 0.04 * rng.uniform(size=noisy.shape[-2:]))
    u = denoise_pdps(noisy, (amap,), model, maxiter=1500)
    cfg = HypergradConfig(cg_maxiter=3000, cg_tol=1e-12, gamma=1e6)
    al = (jnp.asarray(amap, u.dtype),)
    g_ref, _, _ = reg_hypergrad(u, true_, al, model, cfg, want_maps=True)
    g_pal, _, info = reg_hypergrad_pallas(u, true_, al, model, cfg,
                                          want_maps=True, interpret=True)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-10)
