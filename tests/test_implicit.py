"""Differentiable-denoiser (custom_vjp implicit diff) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.solvers.hypergrad import reg_hypergrad
from bpldenoising_tpu.solvers.implicit import diff_denoise, diff_tv_denoise

MAXITER = 6000


def problem(rng, n=16, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    return jnp.asarray(clean), jnp.asarray(clean + sigma *
                                           rng.standard_normal((n, n)))


def test_forward_matches_pdps(rng):
    _, f = problem(rng)
    u_ref = denoise_pdps(f, (0.1,), tv_model(), maxiter=MAXITER)
    u = diff_tv_denoise(f, 0.1, maxiter=MAXITER)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-12)


def test_grad_alpha_matches_reg_hypergrad(rng):
    utrue, f = problem(rng)
    model = tv_model()

    def loss(alpha):
        u = diff_tv_denoise(f, alpha, maxiter=MAXITER)
        return 0.5 * jnp.sum((u - utrue) ** 2)

    g = float(jax.grad(loss)(jnp.asarray(0.08)))
    u = denoise_pdps(f, (0.08,), model, maxiter=MAXITER)
    (g_ref,), _, _ = reg_hypergrad(u, utrue, (jnp.asarray(0.08),), model)
    np.testing.assert_allclose(g, float(g_ref), rtol=1e-6)


def test_grad_f_matches_fd(rng):
    utrue, f = problem(rng, n=12)

    def loss(f_):
        u = diff_tv_denoise(f_, 0.08, maxiter=MAXITER)
        return 0.5 * jnp.sum((u - utrue) ** 2)

    g = jax.grad(loss)(f)
    # finite differences in a few random directions
    rng2 = np.random.default_rng(1)
    for _ in range(3):
        d = jnp.asarray(rng2.standard_normal(f.shape))
        h = 1e-5
        fd = (float(loss(f + h * d)) - float(loss(f - h * d))) / (2 * h)
        np.testing.assert_allclose(float(jnp.vdot(g, d)), fd, rtol=2e-3)


def test_grad_alpha_map(rng):
    """Spatially-varying α: gradient shape matches, correlates with FD."""
    utrue, f = problem(rng, n=12)
    amap0 = jnp.full((12, 12), 0.08)

    def loss(amap):
        u = diff_tv_denoise(f, amap, maxiter=MAXITER)
        return 0.5 * jnp.sum((u - utrue) ** 2)

    g = jax.grad(loss)(amap0)
    assert g.shape == (12, 12)
    d = jnp.asarray(np.random.default_rng(2).standard_normal((12, 12)))
    h = 1e-5
    fd = (float(loss(amap0 + h * d)) - float(loss(amap0 - h * d))) / (2 * h)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), fd, rtol=5e-3)


def test_sumregs_diff(rng):
    utrue, f = problem(rng, n=12)
    model = sumregs_model()

    def loss(alphas):
        u = diff_denoise(f, alphas, model, maxiter=MAXITER)
        return 0.5 * jnp.sum((u - utrue) ** 2)

    a0 = (jnp.asarray(0.05), jnp.asarray(0.03), jnp.asarray(0.02))
    grads = jax.grad(loss)(a0)
    assert len(grads) == 3
    for k in range(3):
        h = 1e-5
        ap = list(a0); ap[k] = a0[k] + h
        am = list(a0); am[k] = a0[k] - h
        fd = (float(loss(tuple(ap))) - float(loss(tuple(am)))) / (2 * h)
        np.testing.assert_allclose(float(grads[k]), fd, rtol=1e-2,
                                   err_msg=f"component {k}")


def test_gradient_descent_on_alpha_improves_cost(rng):
    """The differentiable layer drives a plain first-order outer loop."""
    utrue, f = problem(rng)

    def loss(log_alpha):
        u = diff_tv_denoise(f, jnp.exp(log_alpha), maxiter=2000)
        return 0.5 * jnp.sum((u - utrue) ** 2)

    la = jnp.log(jnp.asarray(0.01))
    val0 = float(loss(la))
    g_fn = jax.jit(jax.value_and_grad(loss))
    for _ in range(15):
        v, g = g_fn(la)
        la = la - 0.5 * g
    assert float(v) < val0
