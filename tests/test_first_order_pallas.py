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
    big_true = jnp.zeros((64, 256, 256))
    big_noisy = jnp.zeros((64, 256, 256))
    with pytest.raises(ValueError, match="too large"):
        single_loop_tv_pallas(big_true, big_noisy, interpret=True)
