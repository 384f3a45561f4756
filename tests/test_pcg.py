"""Pipelined (Chronopoulos–Gear) PCG vs the classic form (bilevel/pcg.py).

Same Krylov iterate in exact arithmetic; these tests pin (a) agreement to
float tolerance on a random SPD system, (b) exact solve on reaching the
Krylov-subspace dimension, (c) warm-start behaviour, and (d) the one-kernel
learner producing an equivalent trajectory under ``cg_variant="pipelined"``
(interpret mode — the TPU A/B lives in scripts/one_kernel_profile.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel.pcg import pcg_classic, pcg_pipelined


def spd_system(rng, n=24):
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    inv_diag = jnp.asarray(1.0 / np.diag(A))
    return (lambda v: Aj @ v), inv_diag, jnp.asarray(b), A, b


def test_pipelined_matches_classic(rng):
    M_apply, inv_diag, bj, A, b = spd_system(rng)
    p0 = jnp.zeros_like(bj)
    for n_adj in (1, 3, 10):
        pc = np.asarray(pcg_classic(M_apply, inv_diag, bj, p0, n_adj))
        pp = np.asarray(pcg_pipelined(M_apply, inv_diag, bj, p0, n_adj))
        np.testing.assert_allclose(pp, pc, rtol=1e-8, atol=1e-10,
                                   err_msg=f"n_adj={n_adj}")


def test_pipelined_solves_at_full_dimension(rng):
    M_apply, inv_diag, bj, A, b = spd_system(rng, n=12)
    x = np.asarray(pcg_pipelined(M_apply, inv_diag, bj,
                                 jnp.zeros_like(bj), 12))
    np.testing.assert_allclose(A @ x, b, rtol=1e-6, atol=1e-8)


def test_pipelined_warm_start(rng):
    M_apply, inv_diag, bj, A, b = spd_system(rng)
    x_star = jnp.asarray(np.linalg.solve(A, b))
    # warm start AT the solution: residual ~0, guards must hold (no NaNs)
    x = np.asarray(pcg_pipelined(M_apply, inv_diag, bj, x_star, 5))
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x, np.asarray(x_star), rtol=1e-5)


def test_one_kernel_pipelined_equivalent_trajectory(rng):
    """Resident kernel with cg_variant='pipelined' (interpret mode) lands
    at the classic kernel's learned α to float-accumulation tolerance —
    different rounding, same math (hence opt-in, not bit-tested)."""
    from bpldenoising_tpu.bilevel.first_order_pallas import single_loop_pallas
    from bpldenoising_tpu.models import tv_model

    n = 16
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(
        np.float32)
    utrue = jnp.asarray(np.stack([clean] * 2))
    f = utrue + 0.1 * jnp.asarray(
        rng.standard_normal((2, n, n)), jnp.float32)
    kw = dict(outer=40, n_inner=10, n_adj=5, interpret=True)
    x_c, _, _ = single_loop_pallas(utrue, f, 0.1, tv_model(), **kw)
    x_p, _, _ = single_loop_pallas(utrue, f, 0.1, tv_model(),
                                   cg_variant="pipelined", **kw)
    np.testing.assert_allclose(float(x_p), float(x_c), rtol=2e-3)


def test_kernel_matches_scan_under_pipelined(rng):
    """The exactness contract (kernel ≍ scan at rtol 1e-9,
    tests/test_first_order_pallas.py) holds identically when BOTH use the
    pipelined CG — the variant swaps in without weakening the oracle."""
    from bpldenoising_tpu.bilevel.first_order import single_loop_learn
    from bpldenoising_tpu.bilevel.first_order_pallas import single_loop_pallas
    from bpldenoising_tpu.models import tv_model

    n = 16
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(
        float)   # float64 like test_first_order_pallas.small_ds: the
    # bit-level contract is an f64 property (f32 drifts at rounding level
    # between jnp.vdot and jnp.sum reduction orders)
    utrue = jnp.asarray(np.stack([clean] * 2))
    f = utrue + 0.1 * jnp.asarray(rng.standard_normal((2, n, n)))
    kw = dict(outer=30, n_inner=10, n_adj=5)
    ref = single_loop_learn(utrue, f, 0.1, tv_model(),
                            cg_variant="pipelined", **kw)
    x_k, u_k, _ = single_loop_pallas(utrue, f, 0.1, tv_model(),
                                     cg_variant="pipelined",
                                     interpret=True, **kw)
    np.testing.assert_allclose(float(x_k), float(ref.alpha), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(ref.u),
                               atol=1e-9)
