"""TV learning function: inner solve + upper-level cost + hypergradient.

Equivalent of ``tv_op_learning_function`` (``src/TVLearningFunctionVec.jl:14-27``)
for scalar and patch parameters, satisfying the L4 contract
``f(x, ds, Δ) -> (u, cost, grad)`` consumed by the trust-region loop
(``src/TRBox.jl:227``).

TPU-first differences from the reference:
* the inner PDPS solve runs on the whole (O, M, N) stack at once (batched,
  single compiled loop) instead of per-image;
* per-image hypergradients are ``vmap``-ed and summed instead of the
  sequential Julia loop (``src/TVLearningFunctionVec.jl:72-83``);
* the Δ > Δt exact/regularized gradient switch (``:21-25``, Δt = 1e-6) is a
  host-side branch between two compiled paths;
* the ENTIRE step (inner solve + cost + hypergradient + pullback) is one
  jitted computation — one device dispatch per trust-region evaluation
  (round-trip latency would otherwise rival the compute itself).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import tv_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig, exact_hypergrad, reg_hypergrad
from ..solvers.pdps import _denoise_pdps_impl
from ..solvers.pdps_pallas import _pallas_impl

__all__ = ["tv_learning_function", "make_tv_learning_function"]

_MODEL = tv_model()


def _solve(f, alphas, model, maxiter, backend, solver_kwargs):
    kw = dict(solver_kwargs or {})
    if backend == "pallas":
        return _pallas_impl(
            f, alphas, model=model, tau0=kw.pop("tau0", 5.0),
            sigma0=kw.pop("sigma0", 0.99 / 5.0), gamma=kw.pop("gamma", 1.0),
            maxiter=maxiter, accel=kw.pop("accel", True),
            interpret=kw.pop("interpret", False))
    return _denoise_pdps_impl(
        f, alphas, model=model, tau0=kw.pop("tau0", 5.0),
        sigma0=kw.pop("sigma0", 0.99 / 5.0), gamma=kw.pop("gamma", 1.0),
        maxiter=maxiter, accel=kw.pop("accel", True),
        tol=kw.pop("tol", None), check_every=kw.pop("check_every", 500),
        return_dual=False)


def _frozen(d: Optional[dict]):
    return tuple(sorted((d or {}).items()))


@functools.partial(
    jax.jit,
    static_argnames=("method", "maxiter", "backend", "cfg", "pop",
                     "solver_kwargs"))
def _tv_step(x, utrue, f, p0, *, method: str, maxiter: int, backend: str,
             cfg: HypergradConfig, pop: Optional[PatchOp],
             solver_kwargs: tuple):
    """One fused learning-function evaluation (single device dispatch).

    ``p0``: optional (O, M, N) warm start for the per-image adjoint CG
    solves; the adjoint state ``p`` is returned for the next call."""
    kw = dict(solver_kwargs)
    alpha_img = pop.apply(x) if pop is not None else x
    u = _solve(f, (alpha_img,), _MODEL, maxiter, backend, kw)

    fn = exact_hypergrad if method == "exact" else reg_hypergrad
    want_maps = pop is not None

    def one(ui, ti, pi):
        grads, padj, _ = fn(ui, ti, (alpha_img,), _MODEL, cfg, want_maps,
                            p0=pi)
        return grads[0], padj

    if p0 is None:
        g_per, p = jax.vmap(lambda ui, ti: one(ui, ti, None))(u, utrue)
    else:
        g_per, p = jax.vmap(one)(u, utrue, p0)
    g = jnp.sum(g_per, axis=0)
    if pop is not None:
        g = pop.apply_adjoint(g)   # ref calc_adjoint pullback (:214,253)

    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    return u, cost, g, p


def tv_learning_function(x, ds, delta, *, delta_t: float = 1e-6,
                         maxiter: int = 5000,
                         cfg: HypergradConfig = HypergradConfig(),
                         backend: str = "jnp",
                         solver_kwargs: Optional[dict] = None,
                         p0=None, return_p: bool = False):
    """L4 learning function for TV denoising.

    Args:
      x: parameter — scalar or (m, n) patch grid.
      ds: ``(true_images, noisy_images)`` stacks of shape (O, M, N).
      delta: current trust-region radius Δ; selects exact vs regularized
        gradient via ``delta > delta_t`` (ref ``:21-25``).

    Returns:
      ``(u, cost, grad)`` with ``u`` (O, M, N), scalar cost
      ½Σ‖u−ū‖² and ``grad`` shaped like ``x``.
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

    if x.ndim == 0:
        pop = None
    elif x.ndim == 2:
        pop = PatchOp.for_image(x, f[0])
    else:
        raise ValueError(f"TV parameter must be scalar or 2-D, got {x.shape}")

    u, cost, g, p = _tv_step(x, utrue, f, p0, method=method,
                             maxiter=int(maxiter), backend=backend, cfg=cfg,
                             pop=pop, solver_kwargs=_frozen(solver_kwargs))
    if squeeze:
        u = u[0]
    if return_p:
        return u, cost, g, p
    return u, cost, g


def make_tv_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``.

    The returned closure warm-starts each hypergradient CG solve from the
    adjoint state of the previous call with the same gradient branch —
    successive trust-region evaluations solve nearby systems, cutting CG
    iterations substantially (capability absent in the reference, which
    re-factorizes from scratch every call)."""
    state: dict = {}

    def lf(x, ds, delta, **overrides):
        kw = dict(defaults)
        kw.update(overrides)
        method = "exact" if float(delta) > kw.get("delta_t", 1e-6) else "reg"
        key = (method, jnp.shape(jnp.asarray(x)),
               jnp.shape(jnp.asarray(ds[0])))
        u, cost, g, p = tv_learning_function(
            x, ds, delta, p0=state.get(key), return_p=True, **kw)
        state[key] = p
        return u, cost, g

    return lf
