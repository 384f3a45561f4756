"""Matrix-free Krylov solvers (CG / BiCGStab) as jit-compatible loops.

TPU-native replacement for the reference's direct sparse solves
(``Adj\\Track`` sparse LU at ``src/TVLearningFunctionVec.jl:131``, dense ``\\``
at ``:158``) and for ``Krylov.cg_lanczos`` (``src/TRBox.jl:135-141``): on TPU
the hypergradient systems are applied as stencil compositions, never
materialized, and solved iteratively.

Operators are callables ``A(x) -> y`` on arrays of any shape; solvers run a
``lax.while_loop`` with static shapes, so they vmap/batch cleanly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

__all__ = ["cg", "cg_batched", "bicgstab", "KrylovInfo"]


class KrylovInfo(NamedTuple):
    iters: jnp.ndarray
    resnorm: jnp.ndarray      # final residual norm
    converged: jnp.ndarray    # bool


def _vdot(a, b):
    return jnp.sum(a * b)


def cg(A: Callable, b, x0=None, *, tol=1e-8, maxiter=500, M=None):
    """Conjugate gradients for SPD ``A``; ``M`` is an optional SPD
    preconditioner callable (applied as M(r) ≈ A⁻¹r)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = M(r) if M is not None else r
    p = z
    rz = _vdot(r, z)
    bnorm = jnp.maximum(jnp.linalg.norm(b.ravel()), jnp.finfo(b.dtype).tiny)

    def cond(carry):
        x, r, z, p, rz, k = carry
        return jnp.logical_and(k < maxiter,
                               jnp.linalg.norm(r.ravel()) > tol * bnorm)

    def body(carry):
        x, r, z, p, rz, k = carry
        Ap = A(p)
        denom = _vdot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r) if M is not None else r
        rz_new = _vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    resnorm = jnp.linalg.norm(r.ravel())
    return x, KrylovInfo(k, resnorm, resnorm <= tol * bnorm)


def cg_batched(A: Callable, b, x0=None, *, tol=1e-8, maxiter=500, M=None,
               item_ndim: int | None = None):
    """CG with PER-ITEM inner products: the leading ``b.ndim - item_ndim``
    axes index independent SPD systems (``A`` and ``M`` must act blockwise
    on them, e.g. a per-image stencil Hessian over a batch).  Each item
    gets its own step scalars and stopping criterion, so the iterate
    trajectory of any one item is INDEPENDENT of how the batch is grouped
    — solving images jointly, per shard, or one at a time produces the
    same per-image solution (the property data-parallel trust-region
    loops rely on; a joint-inner-product :func:`cg` ties all items to
    shared α/β and one global residual test).

    Converged items keep iterating harmlessly (their α, β → 0) until all
    items converge or ``maxiter`` is reached.  ``KrylovInfo.resnorm`` /
    ``converged`` are per-item arrays."""
    if item_ndim is None:
        item_ndim = b.ndim
    axes = tuple(range(-item_ndim, 0))

    def vdot(p, q):
        return jnp.sum(p * q, axis=axes)

    def bc(s):
        return s[(...,) + (None,) * item_ndim]

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = M(r) if M is not None else r
    p = z
    rz = vdot(r, z)
    bnorm = jnp.maximum(jnp.sqrt(vdot(b, b)), jnp.finfo(b.dtype).tiny)

    def cond(carry):
        x, r, z, p, rz, k = carry
        return jnp.logical_and(
            k < maxiter, jnp.any(jnp.sqrt(vdot(r, r)) > tol * bnorm))

    def body(carry):
        x, r, z, p, rz, k = carry
        Ap = A(p)
        denom = vdot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + bc(alpha) * p
        r = r - bc(alpha) * Ap
        z = M(r) if M is not None else r
        rz_new = vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + bc(beta) * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    resnorm = jnp.sqrt(vdot(r, r))
    return x, KrylovInfo(k, resnorm, resnorm <= tol * bnorm)


def bicgstab(A: Callable, b, x0=None, *, tol=1e-8, maxiter=500):
    """BiCGStab for general (nonsymmetric) ``A``.

    Library utility: the hypergradient systems are all solved with
    :func:`cg` after the SPD dual-space reformulation (the reference's
    primal-space α scaling, ``src/SumRegsLearningFunction.jl:260``, is the
    nonsymmetric arrangement this solver would have been needed for)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    rhat = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.maximum(jnp.linalg.norm(b.ravel()), jnp.finfo(b.dtype).tiny)

    def cond(carry):
        x, r, rho, alpha, omega, v, p, k = carry
        return jnp.logical_and(k < maxiter,
                               jnp.linalg.norm(r.ravel()) > tol * bnorm)

    def body(carry):
        x, r, rho, alpha, omega, v, p, k = carry
        rho_new = _vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1.0, rho)) * (
            alpha / jnp.where(omega == 0, 1.0, omega))
        p = r + beta * (p - omega * v)
        v = A(p)
        denom = _vdot(rhat, v)
        alpha = rho_new / jnp.where(denom == 0, 1.0, denom)
        s = r - alpha * v
        t = A(s)
        tt = _vdot(t, t)
        omega = _vdot(t, s) / jnp.where(tt == 0, 1.0, tt)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return (x, r, rho_new, alpha, omega, v, p, k + 1)

    x, r, _, _, _, _, _, k = lax.while_loop(
        cond, body, (x, r, rho, alpha, omega, v, p, 0))
    resnorm = jnp.linalg.norm(r.ravel())
    return x, KrylovInfo(k, resnorm, resnorm <= tol * bnorm)
