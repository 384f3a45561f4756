"""Finite-difference gradient operators (forward / backward / centered).

TPU-native equivalents of ``VariationalImaging.GradientOps``
(``FwdGradientOp`` / ``BwdGradientOp`` / ``CenteredGradientOp``; reference
call sites ``src/TVLearningFunctionVec.jl:17``,
``src/SumRegsLearningFunction.jl:9-11``).  Where the reference materializes
these as 2n²×n² sparse matrices (``matrix(op, n)``,
``src/TVLearningFunctionVec.jl:106``) for UMFPACK solves, here both the
forward map and its adjoint (negative divergence) are explicit stencils built
from shifts/concats, so XLA fuses them into the surrounding elementwise work,
and the same bodies are usable inside Pallas kernels.

Conventions (Chambolle '04 style; Neumann boundary):

* shape: image ``(..., M, N)`` → gradient field ``(..., 2, M, N)``;
  component 0 differentiates axis ``-2`` (rows), component 1 axis ``-1``.
* forward:  ``(D⁺u)[i] = u[i+1] - u[i]``, zero at the last index.
* backward: ``(D⁻u)[i] = u[i] - u[i-1]``, zero at the first index.
* centered: ``(D⁰u)[i] = (u[i+1] - u[i-1])/2`` in the interior, zero at both
  boundary indices.

Operator norms (2-D): ``‖∇⁺‖² = ‖∇⁻‖² ≤ 8``, ``‖∇⁰‖² ≤ 2``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from .linop import LinOp, StatelessOpMixin

__all__ = [
    "FwdGradientOp",
    "BwdGradientOp",
    "CenteredGradientOp",
    "GradientOp",
]


# ---------------------------------------------------------------------------
# 1-D difference stencils along an arbitrary axis (with explicit adjoints)
# ---------------------------------------------------------------------------

def _zeros_slice(u, axis):
    return jnp.zeros_like(lax.slice_in_dim(u, 0, 1, axis=axis))


def dplus(u, axis):
    """Forward difference, zero at last index."""
    d = lax.slice_in_dim(u, 1, None, axis=axis) - lax.slice_in_dim(u, 0, -1, axis=axis)
    return jnp.concatenate([d, _zeros_slice(u, axis)], axis=axis)


def dplus_T(p, axis):
    """Adjoint of :func:`dplus`: ``-p[0]; p[i-1]-p[i]; p[M-2]``."""
    pm = lax.slice_in_dim(p, 0, -1, axis=axis)  # p[0..M-2]
    z = _zeros_slice(p, axis)
    a = jnp.concatenate([z, pm], axis=axis)   # p[i-1] (zero-padded)
    b = jnp.concatenate([pm, z], axis=axis)   # p[i] for i<M-1, else 0
    return a - b


def dminus(u, axis):
    """Backward difference, zero at first index."""
    d = lax.slice_in_dim(u, 1, None, axis=axis) - lax.slice_in_dim(u, 0, -1, axis=axis)
    return jnp.concatenate([_zeros_slice(u, axis), d], axis=axis)


def dminus_T(p, axis):
    """Adjoint of :func:`dminus`: ``-p[1]; p[i]-p[i+1]; p[M-1]``."""
    pp = lax.slice_in_dim(p, 1, None, axis=axis)  # p[1..M-1]
    z = _zeros_slice(p, axis)
    a = jnp.concatenate([z, pp], axis=axis)   # p[i] masked to i>=1
    b = jnp.concatenate([pp, z], axis=axis)   # p[i+1] (zero-padded)
    return a - b


def dcent(u, axis):
    """Centered difference, zero at both boundary indices."""
    d = (lax.slice_in_dim(u, 2, None, axis=axis)
         - lax.slice_in_dim(u, 0, -2, axis=axis)) * 0.5
    z = _zeros_slice(u, axis)
    return jnp.concatenate([z, d, z], axis=axis)


def dcent_T(p, axis):
    """Adjoint of :func:`dcent`: ``(q[i-1] - q[i+1])/2`` with q = interior-masked p."""
    z = _zeros_slice(p, axis)
    q = jnp.concatenate([z, lax.slice_in_dim(p, 1, -1, axis=axis), z], axis=axis)
    down = jnp.concatenate([z, lax.slice_in_dim(q, 0, -1, axis=axis)], axis=axis)
    up = jnp.concatenate([lax.slice_in_dim(q, 1, None, axis=axis), z], axis=axis)
    return (down - up) * 0.5


def dplus_gram(w, axis):
    """diag(D⁺ᵀ diag(w) D⁺) for per-output weights ``w`` (±1 stencil ⇒
    squared-weight version of :func:`dplus_T`)."""
    pm = lax.slice_in_dim(w, 0, -1, axis=axis)
    z = _zeros_slice(w, axis)
    return jnp.concatenate([z, pm], axis=axis) + jnp.concatenate([pm, z], axis=axis)


def dminus_gram(w, axis):
    pp = lax.slice_in_dim(w, 1, None, axis=axis)
    z = _zeros_slice(w, axis)
    return jnp.concatenate([z, pp], axis=axis) + jnp.concatenate([pp, z], axis=axis)


def dcent_gram(w, axis):
    z = _zeros_slice(w, axis)
    q = jnp.concatenate([z, lax.slice_in_dim(w, 1, -1, axis=axis), z], axis=axis)
    down = jnp.concatenate([z, lax.slice_in_dim(q, 0, -1, axis=axis)], axis=axis)
    up = jnp.concatenate([lax.slice_in_dim(q, 1, None, axis=axis), z], axis=axis)
    return (down + up) * 0.25


# ---------------------------------------------------------------------------
# 2-D gradient LinOps
# ---------------------------------------------------------------------------

class GradientOp(StatelessOpMixin, LinOp):
    """Base: stacks one 1-D stencil applied along the last two axes."""

    _fwd = None   # staticmethod (u, axis) -> diff
    _adj = None   # staticmethod (p, axis) -> adjoint diff
    _gram = None  # staticmethod (w, axis) -> diag(DᵀWD) contribution
    _opnorm2 = None  # float upper bound on ||G||²

    def apply(self, u):
        """(..., M, N) → (..., 2, M, N)"""
        fwd = type(self)._fwd
        return jnp.stack([fwd(u, -2), fwd(u, -1)], axis=-3)

    def apply_adjoint(self, p):
        """(..., 2, M, N) → (..., M, N).  This is −div for the matching scheme."""
        adj = type(self)._adj
        return adj(p[..., 0, :, :], -2) + adj(p[..., 1, :, :], -1)

    def opnorm_bound(self) -> float:
        return math.sqrt(type(self)._opnorm2)

    def gram_diag(self, w):
        """diag(Gᵀ diag(w) G): (..., 2, M, N) weights → (..., M, N).

        Used to build Jacobi preconditioners for the hypergradient systems
        (which the reference instead hands to sparse LU,
        ``src/TVLearningFunctionVec.jl:131``).
        """
        gram = type(self)._gram
        return gram(w[..., 0, :, :], -2) + gram(w[..., 1, :, :], -1)


class FwdGradientOp(GradientOp):
    """Forward-difference gradient (the reference's default TV operator)."""
    _fwd = staticmethod(dplus)
    _adj = staticmethod(dplus_T)
    _gram = staticmethod(dplus_gram)
    _opnorm2 = 8.0


class BwdGradientOp(GradientOp):
    """Backward-difference gradient (sumregs op₂)."""
    _fwd = staticmethod(dminus)
    _adj = staticmethod(dminus_T)
    _gram = staticmethod(dminus_gram)
    _opnorm2 = 8.0


class CenteredGradientOp(GradientOp):
    """Centered-difference gradient (sumregs op₃)."""
    _fwd = staticmethod(dcent)
    _adj = staticmethod(dcent_T)
    _gram = staticmethod(dcent_gram)
    _opnorm2 = 2.0
