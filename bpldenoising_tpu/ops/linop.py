"""Minimal linear-operator protocol.

TPU-native replacement for the used surface of ``AlgTools.LinOps`` (reference
call sites: ``src/TVLearningFunctionVec.jl:17,106``): a callable linear map
with an explicit adjoint, an operator-norm estimate, and a dense
materialization used only by tests/oracles (the reference materializes sparse
matrices with ``matrix(op, n)``; on TPU every hot-path application is
matrix-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class LinOp:
    """A linear map with explicit adjoint.

    Subclasses implement :meth:`apply` and :meth:`apply_adjoint` as pure,
    jit-compatible functions of jnp arrays.
    """

    #: input/output shapes are implicit (shape-polymorphic over trailing dims)

    def apply(self, x):
        raise NotImplementedError

    def apply_adjoint(self, y):
        raise NotImplementedError

    def __call__(self, x):
        return self.apply(x)

    @property
    def T(self) -> "AdjointOp":
        return AdjointOp(self)

    # -- diagnostics -------------------------------------------------------

    def opnorm_estimate(self, example_input, iters: int = 50, seed: int = 0):
        """Power-method estimate of ||A||_2 using A^T A."""
        key = jax.random.PRNGKey(seed)
        x = jax.random.normal(key, jnp.shape(example_input),
                              dtype=jnp.result_type(example_input))

        def step(x, _):
            x = x / jnp.linalg.norm(x.ravel())
            y = self.apply_adjoint(self.apply(x))
            return y, jnp.linalg.norm(y.ravel())

        x, norms = jax.lax.scan(step, x, None, length=iters)
        return jnp.sqrt(norms[-1])

    def as_matrix(self, in_shape, dtype=jnp.float32) -> np.ndarray:
        """Dense materialization (tests only; analogue of Julia ``matrix(op,n)``)."""
        n = int(np.prod(in_shape))
        eye = jnp.eye(n, dtype=dtype)
        cols = jax.vmap(lambda e: self.apply(e.reshape(in_shape)).ravel())(eye)
        return np.asarray(cols).T  # (out_dim, in_dim)


class StatelessOpMixin:
    """Equality/hash by type — lets parameterless ops live inside static
    (hashable) model objects without spurious jit-cache misses."""

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))


class AdjointOp(LinOp):
    def __init__(self, op: LinOp):
        self.op = op

    def apply(self, x):
        return self.op.apply_adjoint(x)

    def apply_adjoint(self, y):
        return self.op.apply(y)

    @property
    def T(self) -> LinOp:
        return self.op


class ZeroOp(LinOp):
    """Maps everything to zeros of the same shape (reference: AlgTools ZeroOp)."""

    def apply(self, x):
        return jnp.zeros_like(x)

    def apply_adjoint(self, y):
        return jnp.zeros_like(y)

    def opnorm_estimate(self, example_input, iters: int = 0, seed: int = 0):
        return jnp.asarray(0.0)


class IdentityOp(LinOp):
    def apply(self, x):
        return x

    def apply_adjoint(self, y):
        return y

    def opnorm_estimate(self, example_input, iters: int = 0, seed: int = 0):
        return jnp.asarray(1.0)
