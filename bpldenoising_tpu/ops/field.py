"""Pointwise operations on dual (gradient) fields ``(..., 2, M, N)``.

TPU-native equivalents of ``VariationalImaging.Util`` helpers used by the
reference hypergradient assembly (``xi``, ``scalarprod``, ``prodesc``;
call sites ``src/TVLearningFunctionVec.jl:107-133``).  The reference builds
sparse per-pixel 2×2 block matrices; here everything is plain broadcast
arithmetic on the component axis — fully fusible elementwise work on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["xi", "scalarprod", "norm21", "proj_norm21_ball", "pixel_outer_apply"]


def xi(p, eps: float = 0.0, axes=(-3,)):
    """Per-pixel Euclidean norm of a field: (..., 2, M, N) → (..., M, N).

    Reference: ``VariationalImaging.Util.xi`` (there replicated to stacked
    length 2n²; here kept un-replicated and broadcast where needed).
    ``axes`` selects the reduced (vector-component) axes — the default is
    the component axis; vectorial/color models couple channel + component
    with ``axes=(-4, -3)`` (per-pixel Frobenius norm).
    """
    return jnp.sqrt(jnp.sum(p * p, axis=axes) + eps)


def scalarprod(a, b, axes=(-3,)):
    """Per-pixel inner product of two fields: (..., 2, M, N) → (..., M, N)."""
    return jnp.sum(a * b, axis=axes)


def norm21(p, axes=(-3,)):
    """Group (2,1)-norm: sum over pixels of per-pixel Euclidean norms."""
    return jnp.sum(xi(p, axes=axes), axis=(-2, -1))


def proj_norm21_ball(p, radius, axes=(-3,)):
    """Project each pixel's 2-vector onto the Euclidean ball of ``radius``.

    ``radius`` is a scalar or an (..., M, N) map (spatially-varying α).
    This is prox of the Fenchel conjugate of ``radius·‖·‖_{2,1}`` — the dual
    step of PDPS.  With ``axes=(-4, -3)`` the projection couples the channel
    and component axes (per-pixel Frobenius ball — the vectorial-TV dual
    step).
    """
    n = jnp.expand_dims(xi(p, axes=axes), axes)
    r = jnp.asarray(radius, p.dtype)
    if r.ndim >= 2:  # spatially varying map broadcasts over the reduced axes
        r = jnp.expand_dims(r, axes)
    # NaN-safe: never form 0/0 (α=0 regularizer blocks hit n=r=0 on flat
    # pixels); the untaken division branch is kept finite via the max.
    tiny = jnp.asarray(jnp.finfo(p.dtype).tiny, p.dtype)
    scale = jnp.where(n <= r, 1.0, r / jnp.maximum(n, tiny))
    return p * scale


def pixel_outer_apply(g, v, inv_den3):
    """Apply the per-pixel rank-one block ``(g gᵀ / den³)`` to a field ``v``.

    Equivalent of the reference's ``prodesc(Gu ./ den.^3, Gu)`` sparse matrix
    acting on a stacked vector (``src/TVLearningFunctionVec.jl:119``):
    ``out = g * (g·v) / den³`` pointwise.
    """
    return g * (scalarprod(g, v) * inv_den3)[..., None, :, :]
