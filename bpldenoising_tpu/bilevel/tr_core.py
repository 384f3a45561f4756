"""Generic on-device trust-region core (problem-pluggable).

The dogleg-in-box step, BFGS/L-BFGS quadratic model, ρ/radius schedule and
acceptance logic of the reference's trust-region loop
(``src/TRBox.jl:192-273``) are independent of WHICH bilevel problem is
being learned.  This module factors them out of :mod:`.fused` so every
model family (TV/sumregs via :func:`.fused.bilevel_learn_fused`, TGV² via
:func:`.fused_tgv.bilevel_learn_tgv_fused`) shares one while-loop body and
one segmented host driver; a family supplies only its learning-function
evaluation

    ``eval_lf(x_flat, delta, state) -> (u, cost, g_flat, new_state)``

where ``state`` is an arbitrary pytree chained across trust-region
evaluations (solver warm starts, adjoint warm starts) and ``state=None``
requests a cold start (first evaluation; the returned pytree fixes the
carry structure).  ``eval_lf`` may return a fifth element
``(cg_iters, cg_converged)`` (dtype scalars) — adjoint-CG convergence
telemetry carried into the device log matrix (columns 4–5; the
reference errors on an unconverged Krylov solve,
``src/TRBox.jl:137-139``); families that don't supply it log NaN.

Semantics: same dogleg-in-box as the reference (``src/TRBox.jl:60-76,
99-114``), same η/β radius schedule (``:239-249``), accept iff ρ > 0
(``:251-257``), curvature-gated BFGS update; above ``lbfgs_threshold``
parameters the dense BFGS model is replaced by a fixed-history L-BFGS
state (``src/TRBox.jl:44-52``) so large patch grids never pay an O(n³)
dense solve inside the while loop.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..solvers.lbfgs import (lbfgs_apply, lbfgs_init, lbfgs_solve,
                             lbfgs_update)

__all__ = ["make_tr_machinery", "run_segmented", "splice_dense_B"]

# carry layout (documented for segment callbacks):
#   (it, x_flat, Bst, delta, fx, gx, u, state, log)
IT, X, BST, DELTA, FX, GX, U, STATE, LOG = range(9)


def make_tr_machinery(eval_lf: Callable, *, n: int, dtype, maxiter: int,
                      tol, eta1, eta2, beta1, beta2, lbfgs_threshold: int,
                      lbfgs_memory: int):
    """Build ``(init_carry, cond, body)`` for the fused trust-region loop.

    Must be called inside a jit trace.  ``eval_lf`` is the problem: it maps
    the flat parameter, the current radius (for exact/regularized gradient
    switches) and the chained warm state to ``(u, cost, g_flat, new_state)``.
    """
    use_lbfgs = n > int(lbfgs_threshold)

    def eval_with_info(x, delta, state):
        """Normalize eval_lf's 4- or 5-tuple to a fixed 5-tuple."""
        out = eval_lf(x, delta, state)
        if len(out) == 5:
            u, fx, gx, st, (cg_it, cg_ok) = out
            return u, fx, gx, st, (jnp.asarray(cg_it, dtype),
                                   jnp.asarray(cg_ok, dtype))
        u, fx, gx, st = out
        nan = jnp.asarray(jnp.nan, dtype)
        return u, fx, gx, st, (nan, nan)

    eps_pos = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    tol = jnp.asarray(tol, dtype)
    eta1 = jnp.asarray(eta1, dtype)
    eta2 = jnp.asarray(eta2, dtype)
    beta1 = jnp.asarray(beta1, dtype)
    beta2 = jnp.asarray(beta2, dtype)

    # ---- quadratic model (dense BFGS or fixed-history L-BFGS) ------------
    if use_lbfgs:
        def model_init():
            return lbfgs_init(n, int(lbfgs_memory), dtype, init_scale=0.1)

        def model_newton(ms, g):
            return -lbfgs_solve(ms, g)

        model_apply = lbfgs_apply
        model_update = lbfgs_update
    else:
        def model_init():
            return jnp.eye(n, dtype=dtype) * 0.1

        def model_newton(B, g):
            return jnp.linalg.solve(B, -g[:, None])[:, 0]

        def model_apply(B, v):
            return B @ v

        def model_update(B, y, s):
            sy = s @ y
            ok = sy > 1e-12 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
            Bs = B @ s
            sBs = s @ Bs
            Bp = B + jnp.outer(y, y) / jnp.where(sy == 0, 1.0, sy)
            Bp = jnp.where(sBs > 0,
                           Bp - jnp.outer(Bs, Bs) / jnp.where(sBs == 0, 1.0,
                                                              sBs),
                           Bp)
            return jnp.where(ok, Bp, B)

    # ---- trust-region pieces (jnp ports of .trust_region) ---------------
    def bounds(x, delta):
        return jnp.maximum(-delta, eps_pos - x), jnp.full_like(x, delta)

    def in_bounds(p, lb, ub):
        return jnp.all((p >= lb) & (p <= ub))

    def ray_to_bound(d, lb, ub):
        """Largest t ≥ 0 with t·d in [lb, ub] (0 for d = 0 — fixes the
        host path's d=0 → inf·0 NaN edge)."""
        d_safe = jnp.where(d == 0, 1.0, d)
        ratios = jnp.where(d > 0, ub / d_safe,
                           jnp.where(d < 0, lb / d_safe, jnp.inf))
        t = jnp.min(ratios)
        return jnp.where(jnp.isfinite(t), jnp.maximum(t, 0.0), 0.0)

    def seg_to_bound(p0, d, lb, ub):
        d_safe = jnp.where(d == 0, 1.0, d)
        hi = jnp.where(d > 0, (ub - p0) / d_safe,
                       jnp.where(d < 0, (lb - p0) / d_safe, jnp.inf))
        return jnp.clip(jnp.min(hi), 0.0, 1.0)

    def dogleg(x, g, Bst, delta):
        lb, ub = bounds(x, delta)
        pn = model_newton(Bst, g)
        pn_ok = jnp.all(jnp.isfinite(pn))
        pn_in = jnp.logical_and(pn_ok, in_bounds(pn, lb, ub))
        gBg = g @ model_apply(Bst, g)
        gg = g @ g
        pc = jnp.where(gBg <= jnp.finfo(dtype).eps * gg,
                       -g * 1e12, -(gg / jnp.where(gBg == 0, 1.0, gBg)) * g)
        pc_in = in_bounds(pc, lb, ub)
        dvec = pc / jnp.maximum(jnp.linalg.norm(pc), tiny)
        pc_clip = dvec * ray_to_bound(dvec, lb, ub)
        pn_safe = jnp.where(jnp.isfinite(pn), pn, 0.0)
        t = seg_to_bound(pc, pn_safe - pc, lb, ub)
        p_seg = pc + t * (pn_safe - pc)
        return jnp.where(pn_in, pn_safe,
                         jnp.where(~pc_in, pc_clip,
                                   jnp.where(pn_ok, p_seg, pc)))

    # ---- init (ref init_rest, src/TRBox.jl:34-52) ------------------------
    def init_carry(x0, delta0):
        x = jnp.asarray(x0, dtype).reshape(-1)
        delta = jnp.asarray(delta0, dtype)
        u, fx, gx, state, _ = eval_with_info(x, delta, None)
        Bst = model_init()
        # columns: cost, ‖g‖, Δ, ‖accepted step‖, cg_iters, cg_converged
        log0 = jnp.zeros((maxiter, 6), dtype)
        return (jnp.asarray(0, jnp.int32), x, Bst, delta, fx, gx, u, state,
                log0)

    def cond(carry):
        it = carry[IT]
        delta = carry[DELTA]
        return jnp.logical_and(it < maxiter, delta >= tol)

    def body(carry):
        (it, x, Bst, delta, fx, gx, u, state, log) = carry
        p = dogleg(x, gx, Bst, delta)
        x_new = x + p
        u_new, fx_new, gx_new, state_new, (cg_it, cg_ok) = eval_with_info(
            x_new, delta, state)

        predf = -(p @ gx) - 0.5 * (p @ model_apply(Bst, p))
        rho = jnp.where(predf == 0, -jnp.inf, (fx - fx_new) / predf)

        Bst = model_update(Bst, gx_new - gx, p)

        pnorm = jnp.linalg.norm(p)
        delta_new = jnp.where(
            rho < eta1, beta1 * delta,
            jnp.where(jnp.logical_and(rho > eta2, pnorm > 0.8 * delta),
                      beta2 * delta, delta))
        delta_new = jnp.where(predf < 0, beta1 * delta_new, delta_new)

        accepted = rho > 0
        x = jnp.where(accepted, x_new, x)
        fx = jnp.where(accepted, fx_new, fx)
        gx = jnp.where(accepted, gx_new, gx)
        u = jnp.where(accepted, u_new, u)
        resid = jnp.where(accepted, pnorm, 0.0)

        log = lax.dynamic_update_slice(
            log,
            jnp.stack([fx, jnp.linalg.norm(gx), delta_new, resid,
                       cg_it, cg_ok])[None].astype(dtype),
            (it, jnp.asarray(0, it.dtype)))
        # solver/adjoint warm states always advance to the latest evaluation
        # (a rejected step's state is still a near-solution warm start)
        return (it + 1, x, Bst, delta_new, fx, gx, u, state_new, log)

    return init_carry, cond, body


def splice_dense_B(carry, init_B, dtype):
    """Restore a checkpointed dense BFGS matrix into a fresh carry
    (checkpoint resume; shared by every family's segmented driver).
    No-op when the run uses the L-BFGS model (the checkpoint's dense B
    does not apply) or the shapes disagree."""
    if init_B is None:
        return carry
    B = jnp.asarray(init_B, dtype)
    cur = carry[BST]
    if isinstance(cur, jnp.ndarray) and B.shape == cur.shape:
        return carry[:BST] + (B,) + carry[BST + 1:]
    return carry


def run_segmented(init_carry_fn: Callable, segment_fn: Callable, *,
                  maxiter: int, tol: float, log_every: int,
                  segment_callback=None, post_init=None):
    """Host driver for chunked dispatch: one device program per
    ``log_every`` outer iterations, wall-clock recorded at every hop.

    ``init_carry_fn()`` produces the initial carry (one dispatch);
    ``segment_fn(carry)`` advances it by at most ``log_every`` iterations;
    ``post_init(carry) -> carry`` optionally patches the fresh carry
    (checkpoint resume).  Returns ``(carry, times)`` where ``times[i]`` is
    the segment-end cumulative wall time covering iteration ``i`` — no
    invented sub-segment precision.
    """
    carry = init_carry_fn()
    if post_init is not None:
        carry = post_init(carry)
    times = np.zeros((maxiter,), np.float64)
    prev_it = 0
    t0 = time.perf_counter()
    while True:
        carry = segment_fn(carry)
        it, delta = jax.device_get((carry[IT], carry[DELTA]))
        it = int(it)
        elapsed = time.perf_counter() - t0
        times[prev_it:it] = elapsed
        if segment_callback is not None:
            segment_callback(it, carry, elapsed)
        if it >= maxiter or float(delta) < tol or it == prev_it:
            break
        prev_it = it
    return carry, times
