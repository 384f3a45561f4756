"""Sum-of-regularizers learning function (K = 3 gradient operators).

Equivalent of ``sumregs_learning_function`` (``src/SumRegsLearningFunction.jl:8-36``):
vector α ∈ ℝ³ or patch α of shape (m, n, 3), with the forward/backward/
centered operator triple.  Same L4 contract, batching strategy and fused
single-dispatch step as :mod:`bpldenoising_tpu.learning.tv`.  The reference
uses Δt = 1e-3 for the exact/regularized switch here (``:14``) rather than
TV's 1e-6.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import sumregs_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig, exact_hypergrad, reg_hypergrad
from .tv import _frozen, _solve

__all__ = ["sumregs_learning_function", "make_sumregs_learning_function"]

_MODEL = sumregs_model()


@functools.partial(
    jax.jit,
    static_argnames=("method", "maxiter", "backend", "cfg", "pop",
                     "solver_kwargs"))
def _sumregs_step(x, utrue, f, p0, *, method: str, maxiter: int,
                  backend: str, cfg: HypergradConfig, pop: Optional[PatchOp],
                  solver_kwargs: tuple):
    kw = dict(solver_kwargs)
    if pop is None:
        alphas = tuple(x[k] for k in range(3))
        want_maps = False
    else:
        alphas = tuple(pop.apply(x[..., k]) for k in range(3))
        want_maps = True

    u = _solve(f, alphas, _MODEL, maxiter, backend, kw)

    fn = exact_hypergrad if method == "exact" else reg_hypergrad

    def one(ui, ti, pi):
        grads, padj, _ = fn(ui, ti, alphas, _MODEL, cfg, want_maps, p0=pi)
        return grads, padj

    if p0 is None:
        grads, p = jax.vmap(lambda ui, ti: one(ui, ti, None))(u, utrue)
    else:
        grads, p = jax.vmap(one)(u, utrue, p0)
    if want_maps:
        grad = jnp.stack(
            [pop.apply_adjoint(jnp.sum(g, axis=0)) for g in grads], axis=-1)
    else:
        grad = jnp.stack([jnp.sum(g) for g in grads])

    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    return u, cost, grad, p


def sumregs_learning_function(x, ds, delta, *, delta_t: float = 1e-3,
                              maxiter: int = 5000,
                              cfg: HypergradConfig = HypergradConfig(),
                              backend: str = "jnp",
                              solver_kwargs: Optional[dict] = None,
                              p0=None, return_p: bool = False):
    """L4 learning function for the 3-regularizer model.

    ``x``: (3,) vector of weights, or (m, n, 3) stack of patch grids.
    Returns ``(u, cost, grad)`` with ``grad`` shaped like ``x``.
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    # normalize to a batched (O, M, N) stack — the per-image hypergradient
    # vmap maps over axis 0
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

    u, cost, g, p = _sumregs_step(x, utrue, f, p0, method=method,
                                  maxiter=int(maxiter), backend=backend,
                                  cfg=cfg, pop=pop,
                                  solver_kwargs=_frozen(solver_kwargs))
    if squeeze:
        u = u[0]
    if return_p:
        return u, cost, g, p
    return u, cost, g


def make_sumregs_learning_function(**defaults):
    """Bind configuration; warm-starts adjoint CG like the TV factory."""
    state: dict = {}

    def lf(x, ds, delta, **overrides):
        kw = dict(defaults)
        kw.update(overrides)
        method = "exact" if float(delta) > kw.get("delta_t", 1e-3) else "reg"
        key = (method, jnp.shape(jnp.asarray(x)),
               jnp.shape(jnp.asarray(ds[0])))
        u, cost, g, p = sumregs_learning_function(
            x, ds, delta, p0=state.get(key), return_p=True, **kw)
        state[key] = p
        return u, cost, g

    return lf
