"""TV-L1 denoising: Chambolle–Pock for the L1 data term (impulse noise).

Beyond-reference noise-model axis: the reference's families all use the
quadratic data term matched to Gaussian noise
(``src/TVLearningFunctionVec.jl:20``); impulse (salt-and-pepper) noise is
matched by the robust L1 data term instead,

    min_u  ‖u − f‖₁ + Σ_pix α·|(∇u)_pix|₂            (TV-L1),

whose minimizers are contrast-invariant and remove small structures by
scale rather than by amplitude (Chan & Esedoḡlu 2005).  The L1 term is
not strongly convex, so the iteration is the UNACCELERATED primal–dual
splitting (fixed τ, σ with τσL² < 1; cf. the accelerated scheme in
:mod:`.pdps` which exploits the quadratic term's 1-strong convexity):

    u⁺  = prox_{τ‖·−f‖₁}(u − τ ∇ᵀy) = f + shrink(u − τ∇ᵀy − f, τ)
    ū   = 2u⁺ − u
    y⁺  = Π_{|·|₂ ≤ α}(y + σ ∇ū)

Design notes (TPU-first, same discipline as :mod:`.pdps`): one
``lax.fori_loop`` under one ``jit``, batch rides leading axes, optional
chunked early stop, warm-start ``state0`` chaining.  The scalar-α energy
is exactly :func:`tvl1_energy`; monotone descent of the gap surrogate is
pinned in ``tests/test_tvl1.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..models import tv_model
from ..ops import proj_norm21_ball, norm21

__all__ = ["tvl1_denoise", "tvl1_energy"]

_TV = tv_model()
_GRAD = _TV.ops[0]


def tvl1_energy(u, f, alpha):
    """Primal TV-L1 energy ‖u−f‖₁ + Σ_pix α·|∇u|₂ (per batch element)."""
    e = jnp.sum(jnp.abs(u - f), axis=(-2, -1))
    g = _GRAD.apply(u)
    a = jnp.asarray(alpha, u.dtype)
    if a.ndim >= 2:
        from ..ops import xi
        return e + jnp.sum(a * xi(g), axis=(-2, -1))
    return e + a * norm21(g)


def _shrink(z, t):
    return jnp.sign(z) * jnp.maximum(jnp.abs(z) - t, 0.0)


@functools.partial(
    jax.jit, static_argnames=("maxiter", "check_every", "return_dual"))
def _tvl1_impl(f, alpha, state0=None, *, tau, sigma, maxiter: int, tol,
               check_every: int, return_dual: bool):
    dtype = f.dtype
    tau = jnp.asarray(tau, dtype)
    sigma = jnp.asarray(sigma, dtype)

    if state0 is not None:
        u0, y0 = state0
    else:
        u0 = f
        y0 = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) \
            + 0.0 * f[..., None, :, :]

    def step(carry):
        u, y = carry
        v = u - tau * _GRAD.apply_adjoint(y)
        u_new = f + _shrink(v - f, tau)
        ubar = 2.0 * u_new - u
        y_new = proj_norm21_ball(y + sigma * _GRAD.apply(ubar), alpha)
        return u_new, y_new

    if tol is None:
        u, y = lax.fori_loop(0, maxiter, lambda k, c: step(c), (u0, y0))
        iters = jnp.asarray(maxiter)
    else:
        tol_ = jnp.asarray(tol, dtype)

        def chunk(c):
            (u, y), it, _ = c
            u_prev = u
            n = jnp.minimum(check_every, maxiter - it)
            u, y = lax.fori_loop(0, n, lambda k, s: step(s), (u, y))
            num = jnp.sum((u - u_prev) ** 2)
            den = jnp.maximum(jnp.sum(u ** 2), jnp.asarray(1e-24, dtype))
            return (u, y), it + n, jnp.sqrt(num / den)

        def cond(c):
            _, it, delta = c
            return jnp.logical_and(it < maxiter, delta > tol_)

        (u, y), iters, _ = lax.while_loop(
            cond, chunk, ((u0, y0), jnp.asarray(0),
                          jnp.asarray(jnp.inf, dtype)))

    if return_dual:
        return u, (u, y), iters
    return u


def tvl1_denoise(f, alpha, *, tau0: float = 0.99, sigma0: float = 0.99,
                 maxiter: int = 5000, tol=None, check_every: int = 500,
                 state0=None, return_dual: bool = False):
    """TV-L1 denoising of an image or (O, M, N) batch at weight ``alpha``
    (scalar or (M, N) map).

    ``tau0``/``sigma0`` are divided by L = ‖∇‖ (so the default satisfies
    τσL² = 0.98 < 1); ``state0``/``return_dual`` chain the (u, y) state
    across calls like :func:`.pdps.denoise_pdps`.
    """
    f = jnp.asarray(f)
    alpha = jnp.asarray(alpha, f.dtype)
    L = float(_TV.opnorm_sq()) ** 0.5
    if state0 is not None:
        state0 = tuple(jnp.asarray(s, f.dtype) for s in state0)
    return _tvl1_impl(f, alpha, state0, tau=float(tau0) / L,
                      sigma=float(sigma0) / L, maxiter=int(maxiter),
                      tol=None if tol is None else float(tol),
                      check_every=int(check_every),
                      return_dual=bool(return_dual))
