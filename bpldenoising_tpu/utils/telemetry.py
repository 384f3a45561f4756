"""Adjoint-CG convergence telemetry.

The reference ERRORS when its Krylov solve fails to converge
(``src/TRBox.jl:137-139``: ``stats.solved || error("Newton step
calculation failed")``).  The TPU-native hypergradients replace the
reference's direct sparse solves with matrix-free CG
(:mod:`..solvers.krylov`), whose :class:`..solvers.krylov.KrylovInfo`
carries per-solve ``(iters, resnorm, converged)`` — this module is the one
place that consumes it on the host side:

* :func:`record_adjoint_cg` warns (``RuntimeWarning`` → stderr) when an
  adjoint solve hits its iteration cap, and accumulates running statistics
  on the learning-function closure so experiment drivers and ``bench.py``
  can report ``adjoint_cg_iters`` / ``adjoint_cg_converged`` fields;
* the per-iteration log schema gains the same two fields
  (:mod:`..viz.log`), for both the host loop and the fused on-device loop
  (which carries the counters in its log matrix, ``bilevel/tr_core.py``).

A silently-stalled CG poisons the hypergradient with no other trace — the
warning is non-fatal (unlike the reference's error) because the
trust-region loop is self-correcting: a bad gradient produces a rejected
step and a shrunken radius, which is the right response to an inaccurate
model anyway.
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = ["AdjointCGStats", "record_adjoint_cg"]


class AdjointCGStats:
    """Running statistics over the adjoint-CG solves of one learning
    function (exposed as ``lf.adjoint_cg`` by every factory)."""

    def __init__(self):
        self.n_solves = 0
        self.n_unconverged = 0
        self.iters_total = 0
        self.max_iters = 0
        self.last_iters = 0
        self.last_resnorm = float("nan")
        self.last_converged = True

    def update(self, iters: int, resnorm: float, converged: bool):
        self.n_solves += 1
        self.iters_total += iters
        self.max_iters = max(self.max_iters, iters)
        self.last_iters = iters
        self.last_resnorm = resnorm
        self.last_converged = converged
        if not converged:
            self.n_unconverged += 1

    def as_dict(self) -> dict:
        return {
            "n_solves": self.n_solves,
            "n_unconverged": self.n_unconverged,
            "iters_total": self.iters_total,
            "max_iters": self.max_iters,
            "last_iters": self.last_iters,
            "last_resnorm": self.last_resnorm,
            "last_converged": self.last_converged,
        }

    def __repr__(self):
        return f"AdjointCGStats({self.as_dict()!r})"


def record_adjoint_cg(holder, info, *, context: str = "adjoint") -> dict:
    """Fetch a :class:`..solvers.krylov.KrylovInfo` to the host, update the
    running stats on ``holder`` (created on first use as
    ``holder.adjoint_cg``) and warn if the solve did not converge.

    ``info`` fields may be per-item arrays (``cg_batched``); they reduce to
    the worst case (max iters/residual, all-converged).  Returns the entry
    also stored as ``holder.last_adjoint_cg`` —
    ``{"iters": int, "resnorm": float, "converged": bool}`` — which the
    trust-region loop copies into the per-iteration log.
    """
    import jax

    iters, resnorm, converged = jax.device_get(
        (info.iters, info.resnorm, info.converged))
    entry = {
        "iters": int(np.max(iters)),
        "resnorm": float(np.max(resnorm)),
        "converged": bool(np.all(converged)),
    }
    stats = getattr(holder, "adjoint_cg", None)
    if stats is None:
        stats = AdjointCGStats()
        try:
            holder.adjoint_cg = stats
        except AttributeError:
            pass  # unwritable holder: still warn, skip accumulation
    stats.update(entry["iters"], entry["resnorm"], entry["converged"])
    try:
        holder.last_adjoint_cg = entry
    except AttributeError:
        pass
    if not entry["converged"]:
        # ref errors here (src/TRBox.jl:137-139); non-fatal warning — the
        # TR loop self-corrects via step rejection, but the operator must
        # know the hypergradient accuracy degraded
        warnings.warn(
            f"{context} CG did not converge: {entry['iters']} iterations, "
            f"final residual norm {entry['resnorm']:.3e} — the "
            "hypergradient may be inaccurate (raise cg_maxiter or loosen "
            "cg_tol)", RuntimeWarning, stacklevel=3)
    return entry
