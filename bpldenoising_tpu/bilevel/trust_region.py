"""Nonsmooth trust-region bilevel outer optimizer (TRBox semantics).

Equivalent of the live ``bilevel_learn`` in ``src/TRBox.jl:192-273``:
dogleg step restricted to the ℓ∞ ball of radius Δ intersected with the
positive orthant (box ``[max(−Δ, ε−x), Δ]``, ref ``:159-164``), a BFGS
quadratic model, ared/pred acceptance (accept iff ρ > 0, ref ``:251-257``)
and the radius schedule η₁/η₂/β₁/β₂ (ref ``:239-249``).

The parameter dimension is tiny (1 for scalar α, 3 for sumregs, m·n(·3) for
patch grids), and the loop is inherently sequential and data-dependent
(accept/reject, model update) — so the optimizer state lives on the host in
NumPy float64 and only the learning function touches the accelerator
(SURVEY.md §7: "20 iterations means Python-loop dispatch overhead is
negligible — don't over-engineer").

Documented deviations from the reference (SURVEY.md §7 "quirks"):

* Newton step is ``−B⁻¹g``.  The reference's scalar path computes ``B\\gx``
  *without* the minus sign (``src/TRBox.jl:63``) — an ascent direction that
  burns early iterations until the radius shrinks; the array path
  (``:135-141``) has the correct sign.  We use the correct sign everywhere.
* ``step_to_bound`` returns the scalar distance ``min_i`` to the box along a
  direction; the reference returns an elementwise vector of ratios
  (``:149-152``) whose use in the dogleg combination is not a segment-box
  intersection.
* The BFGS update is gated on curvature ``sᵀy > 0`` (damped-skip); the
  reference gates on ``yᵀBy > 0`` (``:174-186``), which is always true for
  SPD B and so never skips, letting B go indefinite.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .harness import BilevelState, bilevel_iterate

__all__ = ["bilevel_learn", "dogleg_box", "TRModel"]

_EPS = np.finfo(np.float64).eps


class TRModel:
    """Dense BFGS quadratic model B (Hessian approximation).

    Plays the role of ``LinearOperators.LBFGSOperator`` + ``updateBFGS!``
    (``src/TRBox.jl:44-52,174-186``); at these parameter dimensions a dense
    matrix is exact, simpler, and lets the dogleg use a direct solve instead
    of ``Krylov.cg_lanczos`` (``:135-141``).
    """

    def __init__(self, n: int, init_scale: float = 0.1):
        # ref init: B = 0.1 for scalar (src/TRBox.jl:40); identity-scaled here
        self.B = np.eye(n) * init_scale

    def apply(self, v: np.ndarray) -> np.ndarray:
        return self.B @ v

    def newton_step(self, g: np.ndarray) -> Optional[np.ndarray]:
        try:
            pn = np.linalg.solve(self.B, -g)
        except np.linalg.LinAlgError:
            return None
        if not np.all(np.isfinite(pn)):
            return None
        return pn

    def cauchy_step(self, g: np.ndarray) -> np.ndarray:
        gBg = float(g @ self.apply(g))
        gg = float(g @ g)
        if gBg <= _EPS * gg:
            # nonpositive curvature along −g: unbounded model descent;
            # return a long steepest-descent step (clipped to the box later)
            return -g * 1e12
        return -(gg / gBg) * g

    def pred(self, p: np.ndarray, g: np.ndarray) -> float:
        """Predicted decrease −pᵀg − ½pᵀBp (ref ``:166-172``)."""
        return float(-p @ g - 0.5 * p @ self.apply(p))

    def update(self, y: np.ndarray, s: np.ndarray) -> None:
        sy = float(s @ y)
        if sy <= 1e-12 * np.linalg.norm(s) * np.linalg.norm(y):
            return  # skip update without curvature
        Bs = self.apply(s)
        sBs = float(s @ Bs)
        self.B += np.outer(y, y) / sy
        if sBs > 0:
            self.B -= np.outer(Bs, Bs) / sBs


def get_bounds(x: np.ndarray, delta: float):
    """Box for the step: [max(−Δ, ε−x), Δ] — keeps x + p ≥ ε > 0
    (ref ``src/TRBox.jl:159-164``)."""
    lb = np.maximum(-delta, _EPS - x)
    ub = np.full_like(x, delta)
    return lb, ub


def in_bounds(p: np.ndarray, lb: np.ndarray, ub: np.ndarray) -> bool:
    return bool(np.all(p >= lb) and np.all(p <= ub))


def step_to_bound(d: np.ndarray, lb: np.ndarray, ub: np.ndarray) -> float:
    """Largest t ≥ 0 with t·d inside [lb, ub] (scalarized; see module note).
    Returns 0 for d = 0 (every t works; 0 avoids the caller's d·∞ NaN)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        ratios = np.where(d > 0, ub / d, np.where(d < 0, lb / d, np.inf))
    t = float(np.min(ratios))
    if not np.isfinite(t):
        return 0.0
    return max(t, 0.0)


def _segment_to_bound(p0: np.ndarray, d: np.ndarray, lb, ub) -> float:
    """Largest t ∈ [0, 1] with p0 + t·d inside [lb, ub] (p0 feasible)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        hi = np.where(d > 0, (ub - p0) / d, np.where(d < 0, (lb - p0) / d,
                                                     np.inf))
    return float(min(1.0, max(0.0, np.min(hi))))


def dogleg_box(x: np.ndarray, g: np.ndarray, model: TRModel,
               delta: float) -> np.ndarray:
    """Dogleg step restricted to the positivity-aware ℓ∞ box
    (ref ``src/TRBox.jl:60-76,99-114``)."""
    lb, ub = get_bounds(x, delta)
    pn = model.newton_step(g)
    if pn is not None and in_bounds(pn, lb, ub):
        return pn
    pc = model.cauchy_step(g)
    if not in_bounds(pc, lb, ub):
        d = pc / max(np.linalg.norm(pc), _EPS)
        return d * step_to_bound(d, lb, ub)
    if pn is None:
        return pc
    t = _segment_to_bound(pc, pn - pc, lb, ub)
    return pc + t * (pn - pc)


@dataclass
class BilevelResult:
    x: np.ndarray          # learned parameter (original shape)
    u: np.ndarray          # reconstruction at x
    state: BilevelState    # harness state (log, timing)
    cost: float
    g_norm: float
    iterations: int


def bilevel_learn(ds, learning_function: Callable, *, xinit, params,
                  visualise: bool = False, save_iteration_fn=None,
                  checkpoint: Optional[Callable] = None,
                  init_B=None, init_log=None) -> BilevelResult:
    """Trust-region bilevel learning (ref ``src/TRBox.jl:192-273``).

    Args:
      ds: dataset tuple ``(true_images, noisy_images)`` as (O, M, N) arrays.
      learning_function: ``f(x, ds, Δ) -> (u, cost, grad)`` — the L4 contract
        (ref ``src/TVLearningFunctionVec.jl:14-27``); ``u`` is the denoised
        stack, ``cost`` the upper-level loss, ``grad`` shaped like ``x``.
      xinit: initial parameter (scalar, (3,), (m,n) or (m,n,3)).
      params: Params with eta1, eta2, beta1, beta2 (the reference's
        η₁/η₂/β₁/β₂), delta0 (Δ₀), maxiter, tol, verbose_iter.
      checkpoint: optional callback ``checkpoint(iter, x, delta, log, B)``
        run after every accepted iteration (capability the reference lacks;
        SURVEY.md §5 checkpoint/resume).
      init_B: optional dense BFGS matrix to restore on resume (ignored for
        the L-BFGS path).
      init_log: optional list of BilevelLogEntry to seed the harness log
        with (resume: pre-crash history is preserved in the perf file).
    """
    eta1, eta2 = float(params.eta1), float(params.eta2)
    beta1, beta2 = float(params.beta1), float(params.beta2)
    delta = float(params.delta0)

    x0 = np.asarray(xinit, dtype=np.float64)
    shape = x0.shape
    x = x0.reshape(-1).copy()
    n = x.size

    def call_lf(x_flat, d):
        import jax
        u, cost, grad = learning_function(x_flat.reshape(shape), ds, d)
        # u stays on device (only small scalars/grads cross to the host;
        # the reconstruction is materialized once by the caller at the end).
        # cost+grad come over in ONE transfer — on a tunneled device each
        # device→host round trip costs as much as the compute itself
        cost, grad = jax.device_get((cost, grad))
        return (u, float(cost),
                np.asarray(grad, dtype=np.float64).reshape(-1))

    # ref init_rest (src/TRBox.jl:34-52): evaluate at x₀, B init.
    # Dense BFGS is exact and cheap at typical parameter counts; large patch
    # grids switch to limited-memory BFGS (the reference always uses
    # LBFGSOperator for array parameters, src/TRBox.jl:50).
    u, fx, gx = call_lf(x, delta)
    if n > int(params.get("lbfgs_threshold", 64)):
        from ..solvers.lbfgs import LBFGSModel
        model = LBFGSModel(n, memory=int(params.get("lbfgs_memory", 10)),
                           init_scale=0.1)
    else:
        model = TRModel(n, init_scale=0.1)
        if init_B is not None and np.asarray(init_B).shape == (n, n):
            model.B = np.asarray(init_B, dtype=np.float64).copy()
    residual = np.zeros_like(x)
    # resume: continue iteration numbering after the restored history so
    # the perf log stays monotonic and the remaining budget is
    # maxiter − (already-performed iterations), not maxiter more
    it_count = max((e.iter for e in init_log), default=0) if init_log else 0
    st = BilevelState()
    if init_log:
        st.log.extend(init_log)

    def step(verbose):
        nonlocal x, u, fx, gx, delta, residual, it_count
        it_count += 1
        p = dogleg_box(x, gx, model, delta)
        x_new = x + p
        u_new, fx_new, gx_new = call_lf(x_new, delta)

        predf = model.pred(p, gx)
        if predf == 0:
            # ref @error at src/TRBox.jl:231-233; non-fatal here
            import sys
            print("warning: degenerate trust-region step (pred == 0)",
                  file=sys.stderr)
            rho = -np.inf
        else:
            rho = (fx - fx_new) / predf

        model.update(gx_new - gx, p)

        if rho < eta1:
            delta = beta1 * delta
        elif rho > eta2 and np.linalg.norm(p) > 0.8 * delta:
            delta = beta2 * delta
        if predf < 0:
            delta = beta1 * delta

        accepted = rho > 0
        if accepted:  # accept (ref :251-257)
            residual = x - x_new
            x, u, fx, gx = x_new, u_new, fx_new, gx_new

        # 7th element: adjoint-CG telemetry set by the learning-function
        # factories (utils/telemetry.py) — absent for plain closures
        verbose(lambda: (x.reshape(shape), u[0], fx,
                         np.linalg.norm(gx), delta,
                         np.linalg.norm(residual),
                         getattr(learning_function, "last_adjoint_cg",
                                 None)))
        if accepted and checkpoint is not None:
            # after verbose so the snapshot includes this iteration's entry
            checkpoint(it_count, x.reshape(shape), delta, st.log,
                       B=getattr(model, "B", None))
        return delta < float(params.get("tol", 0.0))

    bilevel_iterate(step, params, visualise=visualise,
                    save_iteration_fn=save_iteration_fn, state=st,
                    start_iteration=it_count)
    return BilevelResult(x=x.reshape(shape), u=u, state=st, cost=fx,
                         g_norm=float(np.linalg.norm(gx)),
                         iterations=it_count)
