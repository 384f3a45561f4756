"""TV-L1 learning function: Huber-smoothed inner solve + hypergradient.

Beyond-reference L4 component (the reference's families all learn weights
of the quadratic-data-term model, ``src/TVLearningFunctionVec.jl:14-27``):
satisfies the same contract ``f(x, ds, Δ) -> (u, cost, grad)`` the
trust-region loop consumes (``src/TRBox.jl:227``) for the robust
L1-data-term model matched to impulse noise.

The plain TV-L1 solution path is piecewise constant in α (DESIGN.md
"TV-L1" scope note), so the learnable surrogate smooths both nonsmooth
terms with Huber functions (:mod:`..solvers.tvl1_huber`); the
hypergradient is implicit differentiation of the smoothed optimality
system — one joint SPD CG solve over the whole batch, the data block
being the Huber Hessian diag(γ_d·1{|u−f| ≤ 1/γ_d}) instead of the
identity.  There is no exact active-set branch, so Δ is accepted for
contract compatibility and ignored (same convention as the TGV/VTV
learning functions).  The whole evaluation (PD inner solve + adjoint CG
+ cost) is one jitted computation — a single device dispatch per
trust-region evaluation.

:func:`make_tvl1_learning_function` chains the adjoint CG state across
evaluations always, and the (u, y) inner-solver state when an early-stop
``tol`` is configured (the gradient is evaluated AT the returned
solution, so warm starts cannot bias it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import tv_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig
from ..solvers.tvl1_huber import _tvl1_huber_impl, tvl1_huber_hypergrad

__all__ = ["tvl1_learning_function", "make_tvl1_learning_function"]

_TV = tv_model()


def _step(x, utrue, f, p0, s0, *, gamma_d, maxiter, cfg, tau0, sigma0, tol,
          check_every, pop):
    alpha = pop.apply(x) if pop is not None else x
    L = float(_TV.opnorm_sq()) ** 0.5
    u, state = _tvl1_huber_impl(
        f, alpha, s0, gamma_d=gamma_d, gamma_r=cfg.gamma, tau=tau0 / L,
        sigma=sigma0 / L, maxiter=maxiter, tol=tol,
        check_every=check_every, return_dual=True)
    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    want_maps = pop is not None
    grads, p, info = tvl1_huber_hypergrad(
        u, f, utrue, (alpha,), _TV, cfg, want_maps, p0=p0, gamma_d=gamma_d)
    if want_maps:
        g = pop.apply_adjoint(jnp.sum(grads[0], axis=0))
    else:
        g = grads[0]
    return u, cost, g, p, state, info


_STEP_STATICS = ("maxiter", "cfg", "tol", "check_every", "pop")
_step_jit = jax.jit(_step, static_argnames=_STEP_STATICS)


def tvl1_learning_function(x, ds, delta, *, gamma_d: float = 100.0,
                           gamma: float = 1000.0, maxiter: int = 5000,
                           cg_tol=None, cg_maxiter: int = 2000,
                           tau0: float = 0.99, sigma0: float = 0.99,
                           tol=None, check_every: int = 500,
                           p0=None, s0=None, return_aux: bool = False):
    """L4 learning function for Huber-smoothed TV-L1 denoising.

    Args:
      x: parameter — scalar α or an (m, n) patch grid (spatially-varying
        weights, upsampled by the block-indicator ``PatchOp`` like the
        reference's patch parameterization,
        ``src/TVLearningFunctionVec.jl:57-70``).
      ds: ``(true_images, noisy_images)`` stacks of shape (O, M, N).
      delta: trust-region radius (contract compatibility; the smoothed
        hypergradient has no exact/regularized switch).
      gamma_d / gamma: data / regularizer Huber slopes (width 1/γ);
        larger → closer to the nonsmooth TV-L1 model but flatter
        gradients on its plateaus.
      p0 / s0: adjoint-CG / inner-solver warm-start states from a
        previous evaluation (``return_aux=True`` returns them).

    Returns ``(u, cost, grad)`` with scalar cost ½Σ‖u−ū‖² and ``grad``
    shaped like ``x``; with ``return_aux``,
    ``(u, cost, grad, p, state, info)``.
    """
    del delta
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x = jnp.asarray(x, utrue.dtype)
    if x.ndim == 0:
        pop = None
    elif x.ndim == 2:
        pop = PatchOp(tuple(x.shape), tuple(f.shape[-2:]))
    else:
        raise ValueError(
            f"TV-L1 parameter must be scalar or 2-D, got {x.shape}")
    cfg = HypergradConfig(gamma=float(gamma), cg_tol=cg_tol,
                          cg_maxiter=int(cg_maxiter))
    u, cost, g, p, state, info = _step_jit(
        x, utrue, f, p0, s0, gamma_d=float(gamma_d), maxiter=int(maxiter),
        cfg=cfg, tau0=float(tau0), sigma0=float(sigma0),
        tol=None if tol is None else float(tol),
        check_every=int(check_every), pop=pop)
    if squeeze:
        u = u[0]
    if return_aux:
        return u, cost, g, p, state, info
    return u, cost, g


def make_tvl1_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``.

    The returned closure warm-starts every adjoint CG solve from the
    previous call's state and — when configured with an early-stop
    ``tol`` — also chains the (u, y) inner-solver state (keyed by dataset
    identity, bounded cache; same discipline as the TV/sumregs/TGV
    factories).  Adjoint-CG convergence is surfaced on the closure
    (``lf.adjoint_cg`` / ``lf.last_adjoint_cg`` + RuntimeWarning on
    non-convergence, like the TV/sumregs factory)."""
    from collections import OrderedDict

    from ..utils.telemetry import record_adjoint_cg
    state: OrderedDict = OrderedDict()
    MAX_ENTRIES = 8

    def _get(key, anchor):
        entry = state.get(key)
        return entry[0] if entry is not None and entry[1] is anchor else None

    def _put(key, value, anchor):
        state[key] = (value, anchor)
        state.move_to_end(key)
        while len(state) > MAX_ENTRIES:
            state.popitem(last=False)

    def lf(x, ds, delta, **overrides):
        kw = dict(defaults)
        kw.update(overrides)
        anchor = ds[0]
        base = (jnp.shape(jnp.asarray(x)), jnp.shape(jnp.asarray(ds[0])),
                id(anchor))
        warm_inner = kw.get("tol") is not None
        u, cost, g, p, s, info = tvl1_learning_function(
            x, ds, delta, p0=_get(("adj",) + base, anchor),
            s0=_get(("pd",) + base, anchor) if warm_inner else None,
            return_aux=True, **kw)
        _put(("adj",) + base, p, anchor)
        if warm_inner:
            _put(("pd",) + base, s, anchor)
        record_adjoint_cg(lf, info)
        return u, cost, g

    return lf
