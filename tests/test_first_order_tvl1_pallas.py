"""One-kernel TV-L1 single-loop learner vs the jnp-scan oracle (interpret
mode on CPU): exact agreement on a single salt-and-peppered image,
trajectory, shape validation, and the VMEM size guard."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import single_loop_tvl1_learn
from bpldenoising_tpu.bilevel.first_order_tvl1_pallas import (
    single_loop_tvl1_pallas)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    n = 16
    yy, xx = np.mgrid[0:n, 0:n]
    clean = ((yy - 7.0) ** 2 + (xx - 8.0) ** 2 < 25.0).astype(np.float64)
    noisy = clean.copy()
    hits = rng.uniform(size=clean.shape)
    noisy[hits < 0.1] = 1.0              # salt
    noisy[hits > 0.9] = 0.0              # pepper
    return jnp.asarray(clean), jnp.asarray(noisy)


KW = dict(outer=30, n_inner=20, n_adj=6, lr=0.05)


def test_matches_jnp_scan_oracle(img):
    """Batch-1 per-image dots == global dots, so the jnp scan is an exact
    oracle for the kernel (same update order, same CG recursion, same
    Huber prox and clipped-Adam arithmetic)."""
    clean, noisy = img
    ref = single_loop_tvl1_learn(clean, noisy, 0.4, **KW)
    alpha, u, traj = single_loop_tvl1_pallas(clean, noisy, 0.4,
                                             interpret=True, **KW)
    np.testing.assert_allclose(float(alpha), float(ref.alpha), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj),
                               np.asarray(ref.cost_trajectory), rtol=1e-9)


def test_cost_decreases(img):
    clean, noisy = img
    _, _, traj = single_loop_tvl1_pallas(clean, noisy, 0.1, interpret=True,
                                         outer=60, n_inner=20, n_adj=6,
                                         lr=0.1)
    traj = np.asarray(traj)
    assert np.all(np.isfinite(traj))
    assert traj[-10:].mean() < traj[:10].mean()


def test_batch1_stack_squeeze(img):
    clean, noisy = img
    a2, u2, _ = single_loop_tvl1_pallas(clean[None], noisy[None], 0.4,
                                        interpret=True, **KW)
    a1, u1, _ = single_loop_tvl1_pallas(clean, noisy, 0.4,
                                        interpret=True, **KW)
    assert u2.shape == (1,) + u1.shape
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1))


def test_f32_close_to_f64(img):
    clean, noisy = img
    a64, _, _ = single_loop_tvl1_pallas(clean, noisy, 0.4,
                                        interpret=True, **KW)
    a32, u32, _ = single_loop_tvl1_pallas(
        jnp.asarray(clean, jnp.float32), jnp.asarray(noisy, jnp.float32),
        np.float32(0.4), interpret=True, **KW)
    assert np.all(np.isfinite(np.asarray(u32)))
    np.testing.assert_allclose(float(a32), float(a64), rtol=1e-2)


def test_validation(img):
    clean, noisy = img
    with pytest.raises(ValueError, match="single-image"):
        single_loop_tvl1_pallas(jnp.stack([clean] * 2),
                                jnp.stack([noisy] * 2), 0.4,
                                interpret=True)
    with pytest.raises(ValueError, match="scalar"):
        single_loop_tvl1_pallas(clean, noisy, 0.4 * np.ones((2, 2)),
                                interpret=True)
    with pytest.raises(ValueError, match="strictly positive"):
        single_loop_tvl1_pallas(clean, noisy, 0.0, interpret=True)
    with pytest.raises(ValueError, match="too large"):
        big = jnp.zeros((4096, 4096))
        single_loop_tvl1_pallas(big, big + 1e-3, 0.4, interpret=True)
