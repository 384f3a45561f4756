"""Sum-of-regularizers learning function (K = 3 gradient operators).

Equivalent of ``sumregs_learning_function`` (``src/SumRegsLearningFunction.jl:8-36``):
vector α ∈ ℝ³ or patch α of shape (m, n, 3), with the forward/backward/
centered operator triple.  Same L4 contract, batching strategy and fused
single-dispatch step as :mod:`bpldenoising_tpu.learning.tv` (the shared
``_learning_step`` — joint batched hypergradient, optional PDPS state
warm-starting).  The reference uses Δt = 1e-3 for the exact/regularized
switch here (``:14``) rather than TV's 1e-6.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp

from ..models import sumregs_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig
from .tv import _frozen, _step_jit, make_learning_function

__all__ = ["sumregs_learning_function", "make_sumregs_learning_function"]

_MODEL = sumregs_model()
_sumregs_step = functools.partial(_step_jit, model=_MODEL, K=3)


def sumregs_learning_function(x, ds, delta, *, delta_t: float = 1e-3,
                              maxiter: int = 5000,
                              cfg: HypergradConfig = HypergradConfig(),
                              backend: str = "jnp",
                              solver_kwargs: Optional[dict] = None,
                              p0=None, s0=None, return_aux: bool = False):
    """L4 learning function for the 3-regularizer model.

    ``x``: (3,) vector of weights, or (m, n, 3) stack of patch grids.
    Returns ``(u, cost, grad)`` with ``grad`` shaped like ``x``
    (``(u, cost, grad, p, state, info)`` with ``return_aux``).
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x = jnp.asarray(x, utrue.dtype)
    method = "exact" if float(delta) > delta_t else "reg"

    if x.ndim == 1 and x.shape[0] == 3:
        pop = None
    elif x.ndim == 3 and x.shape[-1] == 3:
        pop = PatchOp.for_image(x[..., 0], f[0])
    else:
        raise ValueError(
            f"sumregs parameter must be (3,) or (m, n, 3), got {x.shape}")

    u, cost, g, p, state, info = _sumregs_step(
        x, utrue, f, p0, s0, method=method, maxiter=int(maxiter),
        backend=backend, cfg=cfg, pop=pop,
        solver_kwargs=_frozen(solver_kwargs))
    if squeeze:
        u = u[0]
    if return_aux:
        return u, cost, g, p, state, info
    return u, cost, g


def make_sumregs_learning_function(**defaults):
    """Sumregs factory for the L4 contract (adjoint-CG + optional PDPS
    warm-starting; see :func:`~bpldenoising_tpu.learning.tv.make_learning_function`)."""
    return make_learning_function(sumregs_learning_function, 1e-3, **defaults)
