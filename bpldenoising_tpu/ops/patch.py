"""Piecewise-constant patch upsampling operator.

TPU-native equivalent of ``VariationalImaging.GradientOps.PatchOp``
(reference call sites: ``src/TVLearningFunctionVec.jl:58-60,166,181,214,253``,
``src/BPLDenoising.jl:62-64,251-253``): maps a small parameter grid
``(m, n)`` to the image grid ``(M, N)`` by constant replication over blocks;
the adjoint (reference ``calc_adjoint(pOp, ·)``) sums over blocks.

Implemented as reshape/broadcast — XLA lowers this to a copy, no gather.
Requires ``M % m == 0`` and ``N % n == 0`` (true for all reference
configurations: 2×2 → 128×128 etc.).
"""

from __future__ import annotations

import jax.numpy as jnp

from .linop import LinOp

__all__ = ["PatchOp"]


class PatchOp(LinOp):
    def __init__(self, size_in: tuple[int, int], size_out: tuple[int, int]):
        m, n = size_in
        M, N = size_out
        if M % m or N % n:
            raise ValueError(
                f"PatchOp requires image size {size_out} divisible by "
                f"parameter grid {size_in}")
        self.size_in = (m, n)
        self.size_out = (M, N)
        self.block = (M // m, N // n)

    @classmethod
    def for_image(cls, param, image) -> "PatchOp":
        """Mirror of the reference constructor ``PatchOp(α, image)``."""
        return cls(tuple(param.shape[-2:]), tuple(image.shape[-2:]))

    def apply(self, x):
        """(..., m, n) → (..., M, N) by block replication."""
        m, n = self.size_in
        bm, bn = self.block
        batch = x.shape[:-2]
        y = jnp.broadcast_to(
            x[..., :, None, :, None], batch + (m, bm, n, bn))
        return y.reshape(batch + (m * bm, n * bn))

    def apply_adjoint(self, g):
        """(..., M, N) → (..., m, n) by block sums."""
        m, n = self.size_in
        bm, bn = self.block
        batch = g.shape[:-2]
        return g.reshape(batch + (m, bm, n, bn)).sum(axis=(-3, -1))

    def __eq__(self, other):
        return (type(self) is type(other) and self.size_in == other.size_in
                and self.size_out == other.size_out)

    def __hash__(self):
        return hash((type(self), self.size_in, self.size_out))

    def opnorm_estimate(self, example_input=None, iters: int = 0, seed: int = 0):
        # ‖P‖ = sqrt(block area): P^T P = (bm*bn) I
        bm, bn = self.block
        return jnp.sqrt(jnp.asarray(float(bm * bn)))
