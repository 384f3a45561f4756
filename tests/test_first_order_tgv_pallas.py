"""One-kernel TGV single-loop learner vs the jnp-scan oracle (interpret
mode on CPU): exact agreement on a single image, trajectory, shape
validation, and the VMEM size guard."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import single_loop_tgv_learn
from bpldenoising_tpu.bilevel.first_order_tgv_pallas import (
    single_loop_tgv_pallas)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(5)
    n = 16
    clean = np.broadcast_to(np.linspace(0.0, 1.0, n), (n, n))
    noisy = clean + 0.1 * rng.standard_normal((n, n))
    return jnp.asarray(clean), jnp.asarray(noisy)


KW = dict(outer=30, n_inner=20, n_adj=6, lr=0.02)


def test_matches_jnp_scan_oracle(img):
    """Batch-1 per-image dots == global dots, so the jnp scan is an exact
    oracle for the kernel (same update order, same CG recursion)."""
    clean, noisy = img
    ref = single_loop_tgv_learn(clean, noisy, np.array([0.05, 0.08]), **KW)
    alpha, u, traj = single_loop_tgv_pallas(
        clean, noisy, np.array([0.05, 0.08]), interpret=True, **KW)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(traj),
                               np.asarray(ref.cost_trajectory), rtol=1e-9)


def test_batch1_stack_squeeze(img):
    clean, noisy = img
    a2, u2, _ = single_loop_tgv_pallas(clean[None], noisy[None],
                                       np.array([0.05, 0.08]),
                                       interpret=True, **KW)
    a1, u1, _ = single_loop_tgv_pallas(clean, noisy,
                                       np.array([0.05, 0.08]),
                                       interpret=True, **KW)
    assert u2.shape == (1,) + u1.shape
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1))


def test_f32_close_to_f64(img):
    clean, noisy = img
    a64, _, _ = single_loop_tgv_pallas(clean, noisy,
                                       np.array([0.05, 0.08]),
                                       interpret=True, **KW)
    a32, u32, _ = single_loop_tgv_pallas(
        jnp.asarray(clean, jnp.float32), jnp.asarray(noisy, jnp.float32),
        np.array([0.05, 0.08], np.float32), interpret=True, **KW)
    assert np.all(np.isfinite(np.asarray(u32)))
    np.testing.assert_allclose(np.asarray(a32), np.asarray(a64), rtol=1e-2)


def test_validation(img):
    clean, noisy = img
    with pytest.raises(ValueError, match="single-image"):
        single_loop_tgv_pallas(jnp.stack([clean] * 2),
                               jnp.stack([noisy] * 2),
                               np.array([0.05, 0.08]), interpret=True)
    with pytest.raises(ValueError, match="2-vector"):
        single_loop_tgv_pallas(clean, noisy, 0.05 * np.ones((2, 2, 2)),
                               interpret=True)
    with pytest.raises(ValueError, match="too large"):
        import bpldenoising_tpu.bilevel.first_order_tgv_pallas as mod
        big = jnp.zeros((4096, 4096))
        single_loop_tgv_pallas(big, big + 1e-3,
                               np.array([0.05, 0.08]), interpret=True)
        del mod
