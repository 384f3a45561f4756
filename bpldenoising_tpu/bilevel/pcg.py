"""Fixed-step preconditioned CG bodies for the single-loop learners.

Two mathematically-equivalent forms of Jacobi-preconditioned CG on the
γ-smoothed adjoint system (``solvers/hypergrad.py::build_reg_system``),
differing only in how many *synchronization points* (vector→scalar
reductions that drain the VPU pipeline) each iteration pays:

``classic``
    Textbook PCG: two inner products per iteration at two separate points
    — ``(d, Md)`` gates the solution/residual updates, then ``(r, z)``
    gates the direction update.  This is the form every jnp-scan oracle
    uses (``first_order.py``), so it is the default: the one-kernel
    learners are tested bit-comparable against the scan
    (``tests/test_first_order_pallas.py``, rtol 1e-9).

``pipelined``
    Chronopoulos–Gear PCG (Chronopoulos & Gear, J. Comput. Appl. Math.
    25 (1989): "s-step iterative methods for symmetric linear systems"):
    both inner products — γ = (r, u), δ = (w, u) with u = P⁻¹r, w = A u —
    depend only on the fresh residual, so they issue back-to-back at ONE
    synchronization point; α/β come from scalar recurrences
    (β = γ/γ₋₁, α = γ/(δ − βγ/α₋₁)).  Costs one extra carried plane
    (``s = A p``) and one extra axpy, halves the reduction drains that
    dominate the one-kernel learner's per-outer-step overhead at small
    batch (BASELINE.md "Roofline": 55% VPU at batch-10).  Same matvec
    count, same Krylov iterate in exact arithmetic; floating-point
    rounding differs, so it is opt-in (``cg_variant="pipelined"``) until
    the scan oracle adopts the same form.

Both run a FIXED ``n_adj`` iterations (no convergence test — the fixed
trip count is what lets the whole learner live in one ``lax.fori_loop``
inside one kernel); zero-denominator guards follow the classic form.

Pure ``jnp``/``lax`` — usable inside Pallas kernels and in plain traced
code alike.  ``vdot`` is injectable so data-parallel callers can psum.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["pcg_classic", "pcg_pipelined", "CG_VARIANTS"]


def _default_vdot(a, b):
    return jnp.sum(a * b)


def pcg_classic(M_apply, inv_diag, b, p, n_adj, vdot=_default_vdot):
    """Textbook Jacobi-PCG: ``n_adj`` iterations from warm start ``p``."""
    r = b - M_apply(p)
    zv = inv_diag * r
    d = zv
    rz = vdot(r, zv)

    def body(_, carry):
        p, r, zv, d, rz = carry
        Md = M_apply(d)
        denom = vdot(d, Md)
        a = rz / jnp.where(denom == 0, 1.0, denom)
        p = p + a * d
        r = r - a * Md
        zv = inv_diag * r
        rz_new = vdot(r, zv)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        d = zv + beta * d
        return (p, r, zv, d, rz_new)

    p, _, _, _, _ = lax.fori_loop(0, n_adj, body, (p, r, zv, d, rz))
    return p


def pcg_pipelined(M_apply, inv_diag, b, p, n_adj, vdot=_default_vdot):
    """Chronopoulos–Gear PCG: one synchronization point per iteration."""
    r = b - M_apply(p)
    dtype = r.dtype
    zero = jnp.zeros_like(r)
    one = jnp.ones((), dtype)

    def body(i, carry):
        x, r, pdir, s, g_prev, a_prev = carry
        u = inv_diag * r
        w = M_apply(u)
        g = vdot(r, u)          # both dots issue back-to-back:
        d = vdot(w, u)          # the single sync point of the iteration
        first = i == 0
        beta = jnp.where(first, 0.0,
                         g / jnp.where(g_prev == 0, 1.0, g_prev))
        denom = d - beta * g / jnp.where(a_prev == 0, 1.0, a_prev)
        a = g / jnp.where(denom == 0, 1.0, denom)
        pdir = u + beta * pdir
        s = w + beta * s
        x = x + a * pdir
        r = r - a * s
        return (x, r, pdir, s, g, a)

    x, _, _, _, _, _ = lax.fori_loop(
        0, n_adj, body, (p, r, zero, zero, one, one))
    return x


CG_VARIANTS = {"classic": pcg_classic, "pipelined": pcg_pipelined}
