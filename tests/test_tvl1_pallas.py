"""Fused TV-L1 Pallas kernel vs the jnp oracle (interpret mode on CPU):
exactness, alpha maps, warm-start chaining across both state formats,
early stop, batching/squeeze, and the beyond-VMEM jnp fallback."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.data import add_impulse_noise, circle_phantom
from bpldenoising_tpu.solvers import tvl1_denoise, tvl1_denoise_pallas


@pytest.fixture(scope="module")
def sp():
    clean = jnp.asarray(circle_phantom(32))
    noisy = jnp.asarray(add_impulse_noise(np.asarray(clean), 0.2, 0))
    return clean, noisy


def test_matches_jnp_oracle(sp):
    _, noisy = sp
    f = jnp.stack([noisy, noisy[::-1]])
    u_ref = tvl1_denoise(f, 0.8, maxiter=400)
    u = tvl1_denoise_pallas(f, 0.8, maxiter=400, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=1e-12)


def test_alpha_map(sp):
    _, noisy = sp
    amap = jnp.asarray(0.2 + 0.8 * np.random.default_rng(1).uniform(
        size=(32, 32)))
    u_ref = tvl1_denoise(noisy, amap, maxiter=300)
    u = tvl1_denoise_pallas(noisy, amap, maxiter=300, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=1e-12)


def test_warm_start_both_state_formats(sp):
    _, noisy = sp
    u1, st_k, _ = tvl1_denoise_pallas(noisy, 0.8, maxiter=200,
                                      return_dual=True, interpret=True)
    u_long = tvl1_denoise(noisy, 0.8, maxiter=400)
    # kernel-format (u, px, py) chaining
    u2 = tvl1_denoise_pallas(noisy, 0.8, maxiter=200, state0=st_k,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_long),
                               atol=1e-12)
    # jnp-format (u, y-stacked) chaining
    _, st_j, _ = tvl1_denoise(noisy, 0.8, maxiter=200, return_dual=True)
    u3 = tvl1_denoise_pallas(noisy, 0.8, maxiter=200, state0=st_j,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u_long),
                               atol=1e-12)


def test_early_stop(sp):
    _, noisy = sp
    u_ref = tvl1_denoise(noisy, 0.8, maxiter=3000)
    u = tvl1_denoise_pallas(noisy, 0.8, maxiter=3000, tol=1e-6,
                            check_every=100, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=5e-3)


def test_squeeze(sp):
    _, noisy = sp
    u1 = tvl1_denoise_pallas(noisy, 0.8, maxiter=100, interpret=True)
    u2 = tvl1_denoise_pallas(noisy[None], 0.8, maxiter=100,
                             interpret=True)
    assert u1.shape == noisy.shape and u2.shape == (1,) + noisy.shape
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2[0]))


def test_beyond_vmem_falls_back_to_jnp(sp, monkeypatch):
    import bpldenoising_tpu.solvers.tvl1_pallas as tp
    monkeypatch.setattr(tp, "_chunk_images", lambda *a, **k: 0)
    _, noisy = sp
    f = noisy[None][:, :31]          # unique shape -> fresh trace
    u_ref = tvl1_denoise(f, 0.8, maxiter=200)
    u = tp.tvl1_denoise_pallas(f, 0.8, maxiter=200, interpret=True)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               atol=1e-12)
    # warm-start format conversion through the fallback
    _, st, _ = tp.tvl1_denoise_pallas(f, 0.8, maxiter=100,
                                      return_dual=True, interpret=True)
    u2 = tp.tvl1_denoise_pallas(f, 0.8, maxiter=100, state0=st,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref),
                               atol=1e-12)
