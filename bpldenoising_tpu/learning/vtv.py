"""Vectorial (color) TV learning function: inner solve + cost + hypergradient.

Beyond-reference L4 component (the reference learns grayscale TV weights
only): satisfies the same contract ``f(x, ds, Δ) -> (u, cost, grad)`` the
trust-region loop consumes (``src/TRBox.jl:227``), for a scalar α, an
(M, N) weight map, or an (m, n) patch grid — on ``(O, C, M, N)`` color
stacks with the channel-coupled Frobenius regularizer.

The hypergradient is implicit differentiation of the γ-Huber smoothed
optimality system (:func:`..solvers.vtv.vtv_implicit_cotangents` — one
SPD CG solve over the C channel planes, per-image inner products); there
is no exact active-set branch, so Δ is accepted for contract compatibility
and ignored.  The whole evaluation is one jitted computation — a single
device dispatch per trust-region evaluation.

Like the TV/sumregs/TGV factories, :func:`make_vtv_learning_function`
chains the solver state across trust-region evaluations when an
early-stop ``tol`` is configured (the implicit gradient is evaluated AT
the returned solution, so warm starts cannot bias it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import vtv_model
from ..ops import PatchOp
from ..solvers.pdps import denoise_pdps
from ..solvers.vtv import vtv_implicit_cotangents

__all__ = ["vtv_learning_function", "make_vtv_learning_function"]

_VTV = vtv_model()


def _solve(f, a, s0, *, maxiter, tau0, sigma0, tol, check_every, backend):
    if backend == "pallas":
        from ..solvers.vtv_pallas import vtv_denoise_pdps_pallas
        interpret = jax.default_backend() == "cpu"
        return vtv_denoise_pdps_pallas(
            f, a, tau0=tau0, sigma0=sigma0, maxiter=maxiter, tol=tol,
            check_every=check_every, state0=s0, return_state=True,
            interpret=interpret)
    u, ys, _ = denoise_pdps(f, a, _VTV, tau0=tau0, sigma0=sigma0,
                            maxiter=maxiter, tol=tol,
                            check_every=check_every, state0=s0,
                            return_dual=True)
    return u, (u, ys)


def _step(x, utrue, f, s0, *, maxiter, gamma, cg_tol, cg_maxiter, tau0,
          sigma0, tol, check_every, backend, pop):
    a = pop.apply(x) if pop is not None else x
    u, state = _solve(f, a, s0, maxiter=maxiter, tau0=tau0, sigma0=sigma0,
                      tol=tol, check_every=check_every, backend=backend)
    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    _, da, info = vtv_implicit_cotangents(u, a, u - utrue, gamma=gamma,
                                          cg_tol=cg_tol,
                                          cg_maxiter=cg_maxiter,
                                          return_info=True)
    grad = pop.apply_adjoint(da) if pop is not None else da
    return u, cost, grad, state, info


_STEP_STATICS = ("maxiter", "gamma", "cg_tol", "cg_maxiter", "tau0",
                 "sigma0", "tol", "check_every", "backend", "pop")
_step_jit = jax.jit(_step, static_argnames=_STEP_STATICS)


def vtv_learning_function(x, ds, delta, *, maxiter: int = 5000,
                          gamma: float = 1e-4, cg_tol: float = 1e-6,
                          cg_maxiter: int = 1000, tau0: float = 5.0,
                          sigma0: float = 0.99 / 5.0, tol=None,
                          check_every: int = 500, backend: str = "jnp",
                          s0=None, return_aux: bool = False):
    """L4 learning function for vectorial-TV denoising.

    Args:
      x: scalar α (0-d), an (M, N) weight map, or an (m, n) patch grid
        (upsampled by :class:`~bpldenoising_tpu.ops.PatchOp`, the color
        analogue of the reference's patch parameterization,
        ``src/TVLearningFunctionVec.jl:57-70``).
      ds: ``(true_images, noisy_images)`` color stacks of shape
        (O, C, M, N) or a single (C, M, N) image.
      delta: trust-region radius (contract compatibility; the smoothed
        hypergradient has no exact/regularized switch).

    Returns ``(u, cost, grad)`` with scalar cost ½Σ‖u−ū‖² and ``grad``
    shaped like ``x``; with ``return_aux``, ``(u, cost, grad, state,
    info)`` where ``info`` is the adjoint solve's
    :class:`..solvers.krylov.KrylovInfo`.
    """
    del delta
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    if f.ndim not in (3, 4):
        raise ValueError(f"VTV expects (C, M, N) or (O, C, M, N) color "
                         f"stacks, got shape {f.shape}")
    squeeze = f.ndim == 3
    if squeeze:
        utrue, f = utrue[None], f[None]
    x = jnp.asarray(x, utrue.dtype)
    if x.ndim == 0:
        pop = None
    elif x.ndim == 2 and x.shape == f.shape[-2:]:
        pop = None                      # full-resolution weight map
    elif x.ndim == 2:
        pop = PatchOp(tuple(x.shape), tuple(f.shape[-2:]))
    else:
        raise ValueError(f"VTV parameter must be a scalar, an (M, N) map "
                         f"or an (m, n) patch grid, got shape {x.shape}")
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


def make_vtv_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``.

    With an early-stop ``tol`` configured, the returned closure chains the
    (u, ys) solver state across evaluations (keyed by dataset identity,
    bounded cache) — the warm-start discipline shared by all families.
    Adjoint-CG convergence is surfaced on the closure (``lf.adjoint_cg`` /
    ``lf.last_adjoint_cg`` + RuntimeWarning on non-convergence)."""
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
        u, cost, grad, s, info = vtv_learning_function(x, ds, delta, s0=s0,
                                                       return_aux=True, **kw)
        if warm:
            state[key] = (s, anchor)
            state.move_to_end(key)
            while len(state) > MAX_ENTRIES:
                state.popitem(last=False)
        record_adjoint_cg(lf, info)
        return u, cost, grad

    return lf
