"""Fused on-device trust-region loop vs the host-driven oracle.

The fused loop (bilevel/fused.py) runs the whole outer loop in one XLA
computation; these tests pin its parity mode against the host
``bilevel_learn`` trajectory and its fast mode (warm-started, early-stopped
inner solves) against the same learned parameters.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
from bpldenoising_tpu.learning import (
    make_sumregs_learning_function,
    make_tv_learning_function,
)
from bpldenoising_tpu.models import sumregs_model
from bpldenoising_tpu.utils.config import Params

PARAMS = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                maxiter=12, tol=1e-5, verbose_iter=0)
INNER = 800


@pytest.fixture
def ds(rng):
    n = 16
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(
        np.float64)
    noisy = np.stack([clean + 0.1 * rng.standard_normal((n, n))
                      for _ in range(2)])
    return (jnp.asarray(np.stack([clean] * 2)), jnp.asarray(noisy))


def test_parity_mode_matches_host(ds):
    lf = make_tv_learning_function(maxiter=INNER, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=0.1, params=PARAMS)
    fused = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                                inner_maxiter=INNER, inner_tol=None,
                                backend="jnp")
    # identical semantics up to joint-vs-per-image CG stopping differences
    np.testing.assert_allclose(float(fused.x), float(host.x), rtol=5e-3)
    np.testing.assert_allclose(float(fused.cost), host.cost, rtol=1e-3)
    assert abs(int(fused.iterations) - host.iterations) <= 2


def test_fast_mode_same_minimizer(ds):
    parity = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                                 inner_maxiter=INNER, inner_tol=None,
                                 backend="jnp")
    fast = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                               inner_maxiter=INNER, inner_tol=1e-8,
                               check_every=100, backend="jnp")
    np.testing.assert_allclose(float(fast.x), float(parity.x), rtol=5e-3)
    np.testing.assert_allclose(float(fast.cost), float(parity.cost),
                               rtol=5e-3)


def test_log_populated(ds):
    fused = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                                inner_maxiter=INNER, inner_tol=None,
                                backend="jnp")
    k = int(fused.iterations)
    log = np.asarray(fused.log)
    assert k >= 1
    assert np.all(np.isfinite(log[:k]))
    assert np.all(log[k:] == 0)
    # cost column is the accepted-iterate cost: non-increasing
    assert np.all(np.diff(log[:k, 0]) <= 1e-12)


def test_pallas_interpret_matches_jnp(ds):
    a = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS | dict(maxiter=4),
                            inner_maxiter=300, inner_tol=1e-7,
                            check_every=100, backend="jnp")
    b = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS | dict(maxiter=4),
                            inner_maxiter=300, inner_tol=1e-7,
                            check_every=100, backend="pallas",
                            interpret=True)
    # the two backends use slightly different early-stop criteria
    # (block-global vs per-image-max), so trajectories differ within tol
    np.testing.assert_allclose(float(b.x), float(a.x), rtol=1e-3)


def test_patch_parameterization(ds):
    params = PARAMS | dict(delta0=1e-4, maxiter=6)
    x0 = 1e-4 * np.ones((2, 2))
    lf = make_tv_learning_function(maxiter=INNER, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=x0, params=params)
    fused = bilevel_learn_fused(ds, xinit=x0, params=params,
                                inner_maxiter=INNER, inner_tol=None,
                                backend="jnp")
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                               rtol=2e-2, atol=1e-7)


def test_sumregs_vector(ds):
    params = PARAMS | dict(delta0=0.01, maxiter=6)
    x0 = np.array([1e-3, 1e-3, 1e-3])
    lf = make_sumregs_learning_function(maxiter=INNER, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=x0, params=params)
    fused = bilevel_learn_fused(ds, xinit=x0, params=params,
                                model=sumregs_model(),
                                inner_maxiter=INNER, inner_tol=None,
                                backend="jnp")
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                               rtol=2e-2, atol=1e-7)


def test_segmented_matches_single_dispatch(ds):
    """Chunked-dispatch mode (log_every=j) runs the same while-loop body in
    segments; trajectories must be IDENTICAL to single-dispatch, and the
    times column must be populated and non-decreasing."""
    one = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                              inner_maxiter=INNER, inner_tol=None,
                              backend="jnp")
    seg = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                              inner_maxiter=INNER, inner_tol=None,
                              backend="jnp", log_every=3)
    assert int(seg.iterations) == int(one.iterations)
    np.testing.assert_array_equal(np.asarray(seg.x), np.asarray(one.x))
    np.testing.assert_array_equal(np.asarray(seg.log), np.asarray(one.log))
    assert one.times is None
    times = np.asarray(seg.times)
    assert times.shape == (int(seg.iterations),)
    assert np.all(times > 0) and np.all(np.diff(times) >= 0)


def test_segment_callback_and_warm_mode(ds):
    hops = []

    def cb(it, carry, elapsed):
        hops.append(it)

    seg = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                              inner_maxiter=INNER, inner_tol=1e-8,
                              check_every=100, backend="jnp", log_every=4,
                              segment_callback=cb)
    one = bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                              inner_maxiter=INNER, inner_tol=1e-8,
                              check_every=100, backend="jnp")
    np.testing.assert_array_equal(np.asarray(seg.x), np.asarray(one.x))
    assert hops and hops[-1] == int(seg.iterations)
    assert all(b - a <= 4 for a, b in zip(hops, hops[1:]))


def test_segmented_rejects_mesh(ds):
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2]), ("batch",))
    with pytest.raises(ValueError, match="log_every"):
        bilevel_learn_fused(ds, xinit=0.1, params=PARAMS,
                            inner_maxiter=50, backend="jnp", mesh=mesh,
                            log_every=2)


def test_lbfgs_state_matches_host_model(rng):
    """The fused loop's fixed-history jnp L-BFGS (masked buffers) must
    reproduce the host LBFGSModel's B·v and B⁻¹·g on the same pair
    history — partially filled and overflowing the memory window."""
    from bpldenoising_tpu.solvers.lbfgs import (
        LBFGSModel, lbfgs_apply, lbfgs_init, lbfgs_solve, lbfgs_update)
    n, mem = 12, 4
    host = LBFGSModel(n, memory=mem, init_scale=0.1)
    st = lbfgs_init(n, mem, jnp.float64, init_scale=0.1)
    for i in range(7):   # overflow the window (7 > 4)
        s = rng.standard_normal(n)
        y = s * (0.5 + rng.random()) + 0.05 * rng.standard_normal(n)
        host.update(y, s)
        st = lbfgs_update(st, jnp.asarray(y), jnp.asarray(s))
        v = rng.standard_normal(n)
        np.testing.assert_allclose(np.asarray(lbfgs_apply(st, v)),
                                   host.apply(v), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(lbfgs_solve(st, v)),
                                   host.solve(v), rtol=1e-9, atol=1e-12)
    assert int(st.count) == mem


def test_lbfgs_skips_noncurvature_pair(rng):
    from bpldenoising_tpu.solvers.lbfgs import lbfgs_init, lbfgs_update
    st = lbfgs_init(5, 3, jnp.float64)
    s = jnp.asarray(rng.standard_normal(5))
    st2 = lbfgs_update(st, -s, s)    # s·y < 0: must be skipped
    assert int(st2.count) == 0
    np.testing.assert_array_equal(np.asarray(st2.S), np.asarray(st.S))


def test_large_patch_grid_uses_lbfgs_and_matches_host(ds):
    """16×16 patch grid (n = 256 > lbfgs_threshold): the fused path must
    run its L-BFGS model (no dense O(n³) solve in the loop) and land at
    the host L-BFGS oracle's parameters (VERDICT r2 item 6)."""
    params = PARAMS | dict(delta0=1e-4, maxiter=5)
    x0 = 1e-4 * np.ones((16, 16))     # image is 16×16 → per-pixel patch
    lf = make_tv_learning_function(maxiter=300, backend="jnp")
    host = bilevel_learn(ds, lf, xinit=x0, params=params)
    fused = bilevel_learn_fused(ds, xinit=x0, params=params,
                                inner_maxiter=300, inner_tol=None,
                                backend="jnp")
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(host.x),
                               rtol=2e-2, atol=1e-7)
    # structural check: the loop carry holds an LBFGSState, not a dense B
    from bpldenoising_tpu.bilevel import fused as fused_mod
    from bpldenoising_tpu.bilevel.first_order import _param_layout
    from bpldenoising_tpu.models import tv_model
    from bpldenoising_tpu.solvers.lbfgs import LBFGSState
    model = tv_model()
    pop, _ = _param_layout(model, jnp.asarray(x0), ds[1].shape[-2:])
    carry = fused_mod._fused_init_impl(
        ds[0], ds[1], jnp.asarray(x0), model=model,
        pop=pop, param_shape=(16, 16), maxiter=5, tol=1e-5,
        eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=1e-4,
        inner_maxiter=50, inner_tol=None, check_every=100, delta_t=1e-6,
        cfg=fused_mod.HypergradConfig(), backend="jnp", interpret=False,
        lbfgs_threshold=64, lbfgs_memory=10)
    assert isinstance(carry[2], LBFGSState)


def test_splice_dense_B_guards_lbfgs_carry():
    """Resuming a dense-B checkpoint into an L-BFGS run must be a no-op,
    not an AttributeError (review finding, round 3)."""
    import jax.numpy as jnp

    from bpldenoising_tpu.bilevel.tr_core import splice_dense_B
    from bpldenoising_tpu.solvers.lbfgs import lbfgs_init

    dense = jnp.eye(3) * 0.1
    carry_dense = (0, jnp.zeros(3), jnp.eye(3) * 0.5, 1.0, 0.0,
                   jnp.zeros(3), None, None, None)
    out = splice_dense_B(carry_dense, np.eye(3), jnp.float64)
    np.testing.assert_array_equal(np.asarray(out[2]), np.eye(3))

    carry_lbfgs = carry_dense[:2] + (lbfgs_init(3, 2, jnp.float64),) + \
        carry_dense[3:]
    out2 = splice_dense_B(carry_lbfgs, np.eye(3), jnp.float64)
    assert out2[2] is carry_lbfgs[2]
    assert splice_dense_B(carry_dense, None, jnp.float64) is carry_dense
    # shape mismatch: no-op
    out3 = splice_dense_B(carry_dense, np.eye(4), jnp.float64)
    np.testing.assert_array_equal(np.asarray(out3[2]),
                                  np.asarray(carry_dense[2]))
    del dense


def test_zero_gradient_no_nan(rng):
    """g = 0 (utrue is the exact TV solution of itself at the fixed point is
    unreachable, so synthesize: noisy == true constant image → u == f and
    cost 0).  The dogleg must return a finite (zero) step — the host path's
    d = 0 ray produced inf·0 = NaN (VERDICT round 1, weak #7)."""
    c = jnp.ones((1, 8, 8), jnp.float64) * 0.5
    ds = (c, c)
    fused = bilevel_learn_fused(ds, xinit=0.1,
                                params=PARAMS | dict(maxiter=3),
                                inner_maxiter=100, inner_tol=None,
                                backend="jnp")
    assert np.isfinite(float(fused.x))
    assert np.isfinite(float(fused.cost))
