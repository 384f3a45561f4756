"""Limited-memory BFGS model (two-loop recursion + compact forward form).

Equivalent of ``LinearOperators.LBFGSOperator`` as used by the reference's
trust region (``src/TRBox.jl:50,135-141,174-186``): the quadratic model B
must support *both* directions used by the dogleg —

* ``B @ v``       (Cauchy step, predicted decrease) — via the compact
  representation B = γI − [γS  Y] W⁻¹ [γS  Y]ᵀ (Byrd–Nocedal–Schnabel);
* ``B⁻¹ @ g``     (Newton step) — via the standard two-loop recursion on the
  inverse Hessian (replacing the reference's ``Krylov.cg_lanczos`` solve).

Used by the trust region when the parameter dimension is large (big patch
grids); small dimensions use the exact dense BFGS in
:mod:`bpldenoising_tpu.bilevel.trust_region`.  Host-side NumPy — the model
dimension is the *parameter* count, never image-sized state.
"""

from __future__ import annotations

from collections import deque

import numpy as np

__all__ = ["LBFGSModel"]


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
