"""Extensibility: a user-defined K=2 model flows through the whole stack
(solver, hypergradient, trust region, single-loop) — the K-generic design
is not special-cased to the reference's K ∈ {1, 3}."""

import jax.numpy as jnp
import numpy as np

from bpldenoising_tpu.bilevel import bilevel_learn
from bpldenoising_tpu.bilevel.first_order import single_loop_learn
from bpldenoising_tpu.models import DenoiseModel
from bpldenoising_tpu.ops import CenteredGradientOp, FwdGradientOp, xi
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.solvers.hypergrad import exact_hypergrad
from bpldenoising_tpu.utils.config import Params

MODEL2 = DenoiseModel(ops=(FwdGradientOp(), CenteredGradientOp()), name="k2")


def problem(rng, n=16, O=1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2 < (n / 3) ** 2).astype(float)
    true_ = np.stack([clean] * O)
    return (jnp.asarray(true_),
            jnp.asarray(true_ + 0.1 * rng.standard_normal((O, n, n))))


def test_solver_kkt(rng):
    _, f = problem(rng)
    alphas = (0.06, 0.02)
    u, ys, _ = denoise_pdps(f[0], alphas, MODEL2, maxiter=8000,
                            return_dual=True)
    recon = f[0]
    for op, y in zip(MODEL2.ops, ys):
        recon = recon - op.apply_adjoint(y)
    assert float(jnp.abs(u - recon).max()) < 3e-4
    for y, a in zip(ys, alphas):
        assert float(xi(y).max()) <= a * (1 + 1e-8)


def test_hypergrad_fd(rng):
    utrue, f = problem(rng)
    alphas = (0.06, 0.02)
    u = denoise_pdps(f[0], alphas, MODEL2, maxiter=20000)
    grads, _, info = exact_hypergrad(
        u, utrue[0], tuple(jnp.asarray(a) for a in alphas), MODEL2)
    assert bool(info.converged)
    for k in range(2):
        h = 1e-5
        ap = list(alphas); ap[k] += h
        am = list(alphas); am[k] -= h
        cp = 0.5 * float(jnp.sum(
            (denoise_pdps(f[0], tuple(ap), MODEL2, maxiter=20000)
             - utrue[0]) ** 2))
        cm = 0.5 * float(jnp.sum(
            (denoise_pdps(f[0], tuple(am), MODEL2, maxiter=20000)
             - utrue[0]) ** 2))
        fd = (cp - cm) / (2 * h)
        np.testing.assert_allclose(float(grads[k]), fd, rtol=1e-2,
                                   err_msg=f"k={k}")


def test_trust_region_learns(rng):
    utrue, f = problem(rng)
    ds = (utrue, f)

    def lf(x, ds_, delta):
        u = denoise_pdps(ds_[1], tuple(x), MODEL2, maxiter=1500)
        import jax
        grads = jax.vmap(
            lambda ui, ti: exact_hypergrad(
                ui, ti, tuple(x), MODEL2)[0])(u, ds_[0])
        g = jnp.stack([jnp.sum(gk) for gk in grads])
        return u, 0.5 * jnp.sum((u - ds_[0]) ** 2), g

    params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.05,
                    maxiter=8, tol=1e-6, verbose_iter=0)
    res = bilevel_learn(ds, lf, xinit=np.array([0.01, 0.01]), params=params)
    _, c0, _ = lf(np.array([0.01, 0.01]), ds, 0.05)
    assert res.cost <= float(c0)
    assert np.all(res.x > 0)


def test_single_loop_k2_vector(rng):
    utrue, f = problem(rng)
    res = single_loop_learn(utrue, f, jnp.full(2, 0.005), MODEL2,
                            outer=100, n_inner=25, n_adj=6, lr=0.1)
    assert res.alpha.shape == (2,)
    costs = np.asarray(res.cost_trajectory)
    assert costs[-10:].mean() < costs[:10].mean()
