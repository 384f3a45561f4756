"""Limited-memory BFGS model (two-loop recursion + compact forward form).

Equivalent of ``LinearOperators.LBFGSOperator`` as used by the reference's
trust region (``src/TRBox.jl:50,135-141,174-186``): the quadratic model B
must support *both* directions used by the dogleg —

* ``B @ v``       (Cauchy step, predicted decrease) — via the compact
  representation B = γI − [γS  Y] W⁻¹ [γS  Y]ᵀ (Byrd–Nocedal–Schnabel);
* ``B⁻¹ @ g``     (Newton step) — via the standard two-loop recursion on the
  inverse Hessian (replacing the reference's ``Krylov.cg_lanczos`` solve).

Two implementations of the same model:

* :class:`LBFGSModel` — host-side NumPy (deque history), used by the
  host-driven trust region for large patch grids;
* the ``lbfgs_*`` functions on :class:`LBFGSState` — pure-jnp fixed-size
  history buffers with a validity mask, traceable inside ``lax.while_loop``
  — used by the fused on-device trust region
  (:mod:`bpldenoising_tpu.bilevel.fused`) above its dense-B threshold.
  Invalid (not-yet-filled) slots are zeros; they drop out of the two-loop
  recursion via ρ = 0 and out of the compact W system via identity
  rows/columns.
"""

from __future__ import annotations

from collections import deque
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["LBFGSModel", "LBFGSState", "lbfgs_init", "lbfgs_update",
           "lbfgs_solve", "lbfgs_apply"]


class LBFGSModel:
    def __init__(self, n: int, memory: int = 10, init_scale: float = 0.1):
        self.n = n
        self.memory = memory
        self.gamma = float(init_scale)   # B₀ = γ I
        self.S: deque[np.ndarray] = deque(maxlen=memory)
        self.Y: deque[np.ndarray] = deque(maxlen=memory)

    # -- updates -----------------------------------------------------------

    def update(self, y: np.ndarray, s: np.ndarray) -> None:
        """Push a curvature pair (y = Δgrad, s = step); skipped when the
        curvature condition fails (same damped-skip policy as the dense
        model — the reference's ``yᵀBy > 0`` gate never skips)."""
        sy = float(s @ y)
        if sy <= 1e-12 * np.linalg.norm(s) * np.linalg.norm(y):
            return
        self.S.append(np.asarray(s, dtype=np.float64).copy())
        self.Y.append(np.asarray(y, dtype=np.float64).copy())
        self.gamma = float(y @ y) / sy   # standard B₀ scaling

    # -- B⁻¹ g : two-loop recursion ---------------------------------------

    def solve(self, g: np.ndarray) -> np.ndarray:
        q = np.asarray(g, dtype=np.float64).copy()
        m = len(self.S)
        alphas = np.zeros(m)
        rhos = np.array([1.0 / (s @ y) for s, y in zip(self.S, self.Y)])
        for i in range(m - 1, -1, -1):
            alphas[i] = rhos[i] * (self.S[i] @ q)
            q -= alphas[i] * self.Y[i]
        q /= self.gamma                     # H₀ = γ⁻¹ I
        for i in range(m):
            beta = rhos[i] * (self.Y[i] @ q)
            q += (alphas[i] - beta) * self.S[i]
        return q

    def newton_step(self, g: np.ndarray):
        return -self.solve(g)

    # -- B v : compact representation -------------------------------------

    def apply(self, v: np.ndarray) -> np.ndarray:
        """B v with B = γI − [γS Y] [[γSᵀS, L], [Lᵀ, −D]]⁻¹ [γS Y]ᵀ v."""
        m = len(self.S)
        if m == 0:
            return self.gamma * v
        S = np.stack(self.S, axis=1)   # (n, m)
        Y = np.stack(self.Y, axis=1)
        g = self.gamma
        StS = S.T @ S
        SY = S.T @ Y
        L = np.tril(SY, k=-1)
        D = np.diag(np.diag(SY))
        W = np.block([[g * StS, L], [L.T, -D]])
        rhs = np.concatenate([g * (S.T @ v), Y.T @ v])
        try:
            sol = np.linalg.solve(W, rhs)
        except np.linalg.LinAlgError:
            return g * v
        return g * v - (g * (S @ sol[:m]) + Y @ sol[m:])

    # -- model interface shared with TRModel -------------------------------

    def cauchy_step(self, g: np.ndarray) -> np.ndarray:
        gBg = float(g @ self.apply(g))
        gg = float(g @ g)
        if gBg <= np.finfo(np.float64).eps * gg:
            return -g * 1e12
        return -(gg / gBg) * g

    def pred(self, p: np.ndarray, g: np.ndarray) -> float:
        return float(-p @ g - 0.5 * p @ self.apply(p))


# ---------------------------------------------------------------------------
# jnp / traceable L-BFGS (fixed-size masked history, for lax.while_loop)
# ---------------------------------------------------------------------------

class LBFGSState(NamedTuple):
    """Fixed-shape L-BFGS model state for device-resident loops.

    Slots along axis 0 are ordered oldest → newest; the last ``count``
    slots are valid, earlier ones are zero-filled placeholders.
    """
    S: jnp.ndarray       # (memory, n) steps
    Y: jnp.ndarray       # (memory, n) gradient differences
    count: jnp.ndarray   # int32, number of valid pairs
    gamma: jnp.ndarray   # scalar, B₀ = γ I


def lbfgs_init(n: int, memory: int, dtype, init_scale: float = 0.1
               ) -> LBFGSState:
    return LBFGSState(S=jnp.zeros((memory, n), dtype),
                      Y=jnp.zeros((memory, n), dtype),
                      count=jnp.zeros((), jnp.int32),
                      gamma=jnp.asarray(init_scale, dtype))


def _valid_mask(st: LBFGSState):
    m = st.S.shape[0]
    return (jnp.arange(m) >= m - st.count).astype(st.S.dtype)


def lbfgs_update(st: LBFGSState, y, s) -> LBFGSState:
    """Curvature-gated push (same damped-skip policy as the host models)."""
    sy = s @ y
    ok = sy > 1e-12 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
    S2 = jnp.roll(st.S, -1, axis=0).at[-1].set(s)
    Y2 = jnp.roll(st.Y, -1, axis=0).at[-1].set(y)
    gamma2 = (y @ y) / jnp.where(sy == 0, 1.0, sy)
    count2 = jnp.minimum(st.count + 1, st.S.shape[0])
    return LBFGSState(
        S=jnp.where(ok, S2, st.S), Y=jnp.where(ok, Y2, st.Y),
        count=jnp.where(ok, count2, st.count),
        gamma=jnp.where(ok, gamma2, st.gamma))


def lbfgs_solve(st: LBFGSState, g):
    """H g = B⁻¹ g via the two-loop recursion (masked history)."""
    m = st.S.shape[0]
    valid = _valid_mask(st)
    sy = jnp.sum(st.S * st.Y, axis=1)
    rho = jnp.where((sy != 0) & (valid > 0), 1.0 / jnp.where(sy == 0, 1.0,
                                                             sy), 0.0)

    def bwd(i, c):
        q, alphas = c
        idx = m - 1 - i                      # newest → oldest
        a = rho[idx] * (st.S[idx] @ q)       # 0 for invalid slots
        return q - a * st.Y[idx], alphas.at[idx].set(a)

    q, alphas = lax.fori_loop(
        0, m, bwd, (g, jnp.zeros((m,), g.dtype)))
    q = q / st.gamma                         # H₀ = γ⁻¹ I

    def fwd(i, q):
        b = rho[i] * (st.Y[i] @ q)
        return q + (alphas[i] - b) * st.S[i]

    return lax.fori_loop(0, m, fwd, q)


def lbfgs_apply(st: LBFGSState, v):
    """B v via the compact representation (masked history).

    B = γI − [γS Y] W⁻¹ [γS Y]ᵀ with W = [[γSᵀS, L], [Lᵀ, −D]]; invalid
    slots get identity rows/columns in W and zero right-hand sides, so
    their solution components are exactly zero.
    """
    m = st.S.shape[0]
    valid = _valid_mask(st)
    g = st.gamma
    S = st.S * valid[:, None]
    Y = st.Y * valid[:, None]
    StS = S @ S.T
    SY = S @ Y.T                  # SY[i, j] = s_i · y_j (oldest first)
    L = jnp.tril(SY, k=-1)
    D = jnp.diag(jnp.diag(SY))
    W = jnp.block([[g * StS, L], [L.T, -D]])
    valid2 = jnp.concatenate([valid, valid])
    W = W * jnp.outer(valid2, valid2) + jnp.diag(1.0 - valid2)
    rhs = jnp.concatenate([g * (S @ v), Y @ v]) * valid2
    sol = jnp.linalg.solve(W, rhs)
    out = g * v - (g * (S.T @ sol[:m]) + Y.T @ sol[m:])
    # singular W (numerically degenerate history) → fall back to B₀ v,
    # mirroring the host model's LinAlgError fallback
    return jnp.where(jnp.all(jnp.isfinite(out)), out, g * v)
