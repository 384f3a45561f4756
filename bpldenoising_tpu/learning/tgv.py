"""TGV² learning function: inner solve + upper-level cost + hypergradient.

Beyond-reference L4 component (the reference learns TV-type weights only):
satisfies the same contract ``f(x, ds, Δ) -> (u, cost, grad)`` the
trust-region loop consumes (``src/TRBox.jl:227``), for the 2-vector
parameter x = (α₁, α₀) or an (m, n, 2) stack of patch grids.

The hypergradient comes from implicit differentiation of the γ-Huber
smoothed joint optimality system (one SPD CG solve over the stacked
(u, w) planes — the TGV analogue of the reference's γ-regularized branch,
``src/TVLearningFunctionVec.jl:137-161``); there is no exact active-set
branch, so Δ is accepted for contract compatibility and ignored.  The
whole evaluation (PDPS + adjoint CG + cost) is one jitted computation —
a single device dispatch per trust-region evaluation, with the batch
solved jointly (reference loops images sequentially,
``src/TVLearningFunctionVec.jl:72-83``).

Like the TV/sumregs factories, :func:`make_tgv_learning_function` chains
the full (u, w, p, q) solver state across trust-region evaluations when an
early-stop ``tol`` is configured: evaluations at nearby α converge in a
few hundred PDPS iterations instead of the cold budget (the implicit
gradient is evaluated AT the returned solution, so warm starts cannot
bias it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import PatchOp
from ..solvers.tgv import tgv_implicit_cotangents

__all__ = ["tgv_learning_function", "make_tgv_learning_function"]


def _solve(f, a1, a0, s0, *, maxiter, tau0, sigma0, tol, check_every,
           backend):
    if backend == "pallas":
        from ..solvers.tgv_pallas import tgv_denoise_pdps_pallas
        interpret = backend == "pallas" and \
            jax.default_backend() == "cpu"
        u, w, state = tgv_denoise_pdps_pallas(
            f, a1, a0, tau0=tau0, sigma0=sigma0, maxiter=maxiter, tol=tol,
            check_every=check_every, state0=s0, return_state=True,
            interpret=interpret)
        return u, w, state
    from ..solvers.tgv import _tgv_impl
    u, w, state, _ = _tgv_impl(f, a1, a0, s0, tau0=tau0, sigma0=sigma0,
                               maxiter=maxiter, tol=tol,
                               check_every=check_every, return_state=True)
    return u, w, state


def _step(x, utrue, f, s0, *, maxiter, gamma, cg_tol, cg_maxiter, tau0,
          sigma0, tol, check_every, backend, pop):
    if pop is not None:     # (m, n, 2) patch grids → image-size maps
        a1 = pop.apply(x[..., 0])
        a0 = pop.apply(x[..., 1])
    else:
        a1, a0 = x[0], x[1]
    u, w, state = _solve(f, a1, a0, s0, maxiter=maxiter, tau0=tau0,
                         sigma0=sigma0, tol=tol, check_every=check_every,
                         backend=backend)
    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    _, (g1, g0), info = tgv_implicit_cotangents(
        u, w, (a1, a0), u - utrue, gamma=gamma, cg_tol=cg_tol,
        cg_maxiter=cg_maxiter, return_info=True)
    if pop is not None:     # pull map cotangents back to the patch grids
        grad = jnp.stack([pop.apply_adjoint(g1), pop.apply_adjoint(g0)],
                         axis=-1)
    else:
        grad = jnp.stack([g1, g0])
    return u, cost, grad, state, info


_STEP_STATICS = ("maxiter", "gamma", "cg_tol", "cg_maxiter", "tau0",
                 "sigma0", "tol", "check_every", "backend", "pop")
_step_jit = jax.jit(_step, static_argnames=_STEP_STATICS)


def tgv_learning_function(x, ds, delta, *, maxiter: int = 5000,
                          gamma: float = 1e-4, cg_tol: float = 1e-6,
                          cg_maxiter: int = 1000, tau0: float = 0.99,
                          sigma0: float = 0.99, tol=None,
                          check_every: int = 500, backend: str = "jnp",
                          s0=None, return_aux: bool = False):
    """L4 learning function for TGV² denoising.

    Args:
      x: parameter 2-vector ``[α₁, α₀]`` (first-order, second-order weight)
        or an (m, n, 2) stack of patch grids for spatially-varying weights
        (the TGV analogue of the reference's patch parameterization,
        ``src/TVLearningFunctionVec.jl:57-70``).
      ds: ``(true_images, noisy_images)`` stacks of shape (O, M, N).
      delta: trust-region radius (contract compatibility; the smoothed
        hypergradient has no exact/regularized switch).
      s0 / return_aux: solver warm-start state from a previous evaluation
        (``return_aux=True`` returns it).

    Returns ``(u, cost, grad)`` with scalar cost ½Σ‖u−ū‖² and ``grad``
    shaped like ``x``; with ``return_aux``, ``(u, cost, grad, state,
    info)`` where ``info`` is the adjoint solve's
    :class:`..solvers.krylov.KrylovInfo`.
    """
    del delta
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x = jnp.asarray(x, utrue.dtype)
    if x.shape == (2,):
        pop = None
    elif x.ndim == 3 and x.shape[-1] == 2:
        pop = PatchOp(tuple(x.shape[:2]), tuple(f.shape[-2:]))
    else:
        raise ValueError(f"TGV parameter must be a length-2 vector "
                         f"[alpha1, alpha0] or an (m, n, 2) patch stack, "
                         f"got shape {x.shape}")
    u, cost, grad, state, info = _step_jit(
        x, utrue, f, s0, maxiter=int(maxiter), gamma=float(gamma),
        cg_tol=float(cg_tol), cg_maxiter=int(cg_maxiter), tau0=float(tau0),
        sigma0=float(sigma0), tol=None if tol is None else float(tol),
        check_every=int(check_every), backend=str(backend), pop=pop)
    if squeeze:
        u = u[0]
    if return_aux:
        return u, cost, grad, state, info
    return u, cost, grad


def make_tgv_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``.

    When configured with an early-stop ``tol``, the returned closure chains
    the full (u, w, p, q) solver state across evaluations (keyed by dataset
    identity, bounded cache) — the same warm-start discipline as the
    TV/sumregs factories.  Adjoint-CG convergence is surfaced on the
    closure (``lf.adjoint_cg`` / ``lf.last_adjoint_cg`` + RuntimeWarning
    on non-convergence)."""
    from collections import OrderedDict

    from ..utils.telemetry import record_adjoint_cg
    state: OrderedDict = OrderedDict()
    MAX_ENTRIES = 8

    def lf(x, ds, delta, **overrides):
        kw = dict(defaults)
        kw.update(overrides)
        warm = kw.get("tol") is not None
        s0 = None
        anchor = ds[0]
        key = (jnp.shape(jnp.asarray(x)), jnp.shape(jnp.asarray(ds[0])),
               id(anchor))
        if warm:
            entry = state.get(key)
            if entry is not None and entry[1] is anchor:
                s0 = entry[0]
        u, cost, grad, s, info = tgv_learning_function(x, ds, delta, s0=s0,
                                                       return_aux=True, **kw)
        if warm:
            state[key] = (s, anchor)
            state.move_to_end(key)
            while len(state) > MAX_ENTRIES:
                state.popitem(last=False)
        record_adjoint_cg(lf, info)
        return u, cost, grad

    return lf
