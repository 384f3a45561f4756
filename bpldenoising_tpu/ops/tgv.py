"""Symmetrized gradient for second-order TGV regularization.

Beyond-reference model family: the reference learns parameters of
first-order TV-type regularizers only (``src/TVLearningFunctionVec.jl``,
``src/SumRegsLearningFunction.jl``).  TGV² (total generalized variation,
Bredies–Kunisch–Pock 2010) removes TV's staircasing by penalizing

    α₁ ‖∇u − w‖_{2,1} + α₀ ‖E(w)‖_{2,1}

over an auxiliary vector field w, where E(w) = ½(∇w + ∇wᵀ) is the
symmetrized gradient.  This module provides E and its exact adjoint as
stencil code in the house style (``ops/grad.py``): shape-polymorphic jnp
shifts/concats that XLA fuses, usable inside Pallas kernel bodies.

Discretization (complementing the forward-difference ∇ of
:class:`..ops.FwdGradientOp`, Neumann boundary): backward differences,

    E(w) = (D⁻ᵣ w_r,  D⁻_c w_c,  (D⁻_c w_r + D⁻ᵣ w_c)/√2)

with the off-diagonal stored once, scaled by √2, so the per-pixel
Euclidean norm of the 3-field equals the Frobenius norm of the symmetric
2×2 tensor (|E|² = E_rr² + E_cc² + 2·E_rc²) and every downstream utility
(``proj_norm21_ball``, ``xi``, Huber) applies unchanged on the component
axis.

Shapes: vector field ``(..., 2, M, N)`` (component 0 = rows axis ``-2``,
matching ``GradientOp``) → tensor field ``(..., 3, M, N)``.

Operator norms: ``‖E‖² ≤ 8``; the joint TGV operator
K(u, w) = (∇u − w, E w) satisfies ``‖K‖² ≤ 12`` (the constant used by
Bredies et al.; verified by power method in ``tests/test_tgv.py``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .grad import dminus, dminus_T
from .linop import LinOp, StatelessOpMixin

__all__ = ["SymGradientOp", "sym_grad", "sym_div", "TGV_OPNORM_SQ"]

_SQRT2 = math.sqrt(2.0)

#: upper bound on ‖(u, w) ↦ (∇u − w, E w)‖² for the fwd-∇ / bwd-E scheme
TGV_OPNORM_SQ = 12.0


def sym_grad(w):
    """E(w): ``(..., 2, M, N)`` → ``(..., 3, M, N)`` (√2-weighted off-diag)."""
    wr = w[..., 0, :, :]
    wc = w[..., 1, :, :]
    err = dminus(wr, -2)
    ecc = dminus(wc, -1)
    erc = (dminus(wr, -1) + dminus(wc, -2)) / _SQRT2
    return jnp.stack([err, ecc, erc], axis=-3)


def sym_div(z):
    """Exact adjoint of :func:`sym_grad`: ``(..., 3, M, N)`` → ``(..., 2, M, N)``.

    (Named for the usual identification Eᵀ = −div on symmetric tensor
    fields; like ``GradientOp.apply_adjoint`` this returns Eᵀz, i.e. the
    NEGATIVE divergence.)
    """
    zrr = z[..., 0, :, :]
    zcc = z[..., 1, :, :]
    zrc = z[..., 2, :, :]
    out_r = dminus_T(zrr, -2) + dminus_T(zrc, -1) / _SQRT2
    out_c = dminus_T(zcc, -1) + dminus_T(zrc, -2) / _SQRT2
    return jnp.stack([out_r, out_c], axis=-3)


class SymGradientOp(StatelessOpMixin, LinOp):
    """LinOp wrapper over :func:`sym_grad`/:func:`sym_div` (adjoint-identity
    and dense-matrix oracles come for free from the protocol)."""

    def apply(self, w):
        return sym_grad(w)

    def apply_adjoint(self, z):
        return sym_div(z)

    def opnorm_bound(self) -> float:
        return math.sqrt(8.0)
