"""Variational denoising model definitions.

A :class:`DenoiseModel` declares the lower-level problem

    min_u  ½‖u − f‖² + Σₖ ‖αₖ Gₖ u‖_{2,1}

as data: the tuple of regularizer operators Gₖ.  Solvers (PDPS), learning
functions (hypergradients) and experiments all consume the same model object,
so the TV model (K=1, reference ``src/TVLearningFunctionVec.jl:14-27``) and
the sum-of-regularizers model (K=3, ``src/SumRegsLearningFunction.jl:8-36``)
share one code path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops import LinOp, norm21, xi


@dataclass(frozen=True)
class DenoiseModel:
    """The lower-level variational problem, as data.

    ``channels=True`` declares a vectorial (multichannel / color) model:
    images carry a channel axis at ``-3`` — shape ``(..., C, M, N)`` — and
    the regularizer couples channels through a per-pixel FROBENIUS norm over
    (channel, component) instead of a per-channel Euclidean norm.  All
    linear operators are channel-wise (they treat C as a batch dim); the
    coupling lives entirely in the norm/projection axes.
    """

    ops: tuple[LinOp, ...]
    name: str = "model"
    channels: bool = False

    @property
    def K(self) -> int:
        return len(self.ops)

    @property
    def norm_axes(self) -> tuple[int, ...]:
        """Axes reduced by the per-pixel dual norm on a gradient field
        (component axis only, or channel+component when coupled)."""
        return (-4, -3) if self.channels else (-3,)

    @property
    def image_axes(self) -> tuple[int, ...]:
        """Per-sample reduction axes of an image array."""
        return (-3, -2, -1) if self.channels else (-2, -1)

    def opnorm_sq(self) -> float:
        """Upper bound on ‖[G₁; …; G_K]‖² = Σ ‖Gₖ‖²."""
        total = 0.0
        for op in self.ops:
            bound = getattr(op, "opnorm_bound", None)
            if bound is None:
                raise ValueError(f"op {op} has no opnorm_bound")
            total += bound() ** 2
        return total

    def canonical_alphas(self, alphas):
        """Normalize user-facing α into a K-tuple of jnp scalars/maps.

        Accepted forms (mirroring the reference API surface):
        * scalar / 0-d array            (K == 1)
        * (M, N) map                    (K == 1, spatially varying)
        * length-K sequence of scalars or maps
        * (..., K) stacked array of K scalar weights (sumregs vector α)
        """
        if isinstance(alphas, (tuple, list)):
            if len(alphas) != self.K:
                raise ValueError(f"expected {self.K} alphas, got {len(alphas)}")
            return tuple(jnp.asarray(a) for a in alphas)
        a = jnp.asarray(alphas)
        if self.K == 1:
            return (a,)
        if a.ndim == 1 and a.shape[0] == self.K:
            return tuple(a[k] for k in range(self.K))
        if a.ndim == 3 and a.shape[-1] == self.K:
            return tuple(a[..., k] for k in range(self.K))
        raise ValueError(
            f"cannot interpret alpha of shape {a.shape} for K={self.K}")

    def energy(self, u, f, alphas):
        """Primal energy ½‖u−f‖² + Σₖ Σ_pix αₖ·|Gₖu|₂ (per batch element).

        For a ``channels=True`` model the data term sums over channels and
        the per-pixel norm is the Frobenius norm over (channel, component).
        """
        alphas = self.canonical_alphas(alphas)
        e = 0.5 * jnp.sum((u - f) ** 2, axis=self.image_axes)
        for op, a in zip(self.ops, alphas):
            g = op.apply(u)
            if jnp.ndim(a) >= 2:
                e = e + jnp.sum(a * xi(g, axes=self.norm_axes),
                                axis=(-2, -1))
            else:
                e = e + a * norm21(g, axes=self.norm_axes)
        return e
