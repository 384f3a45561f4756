"""TGV² learning function: inner solve + upper-level cost + hypergradient.

Beyond-reference L4 component (the reference learns TV-type weights only):
satisfies the same contract ``f(x, ds, Δ) -> (u, cost, grad)`` the
trust-region loop consumes (``src/TRBox.jl:227``), for the 2-vector
parameter x = (α₁, α₀) of second-order TGV denoising
(:mod:`..solvers.tgv`).

The hypergradient comes from implicit differentiation of the γ-Huber
smoothed joint optimality system (one SPD CG solve over the stacked
(u, w) planes — the TGV analogue of the reference's γ-regularized branch,
``src/TVLearningFunctionVec.jl:137-161``); there is no exact active-set
branch, so Δ is accepted for contract compatibility and ignored.  The
whole evaluation (5000-iteration PDPS + adjoint CG + cost) is one jitted
computation — a single device dispatch per trust-region evaluation, with
the batch solved jointly (reference loops images sequentially,
``src/TVLearningFunctionVec.jl:72-83``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..solvers.tgv import make_diff_tgv_denoise

__all__ = ["tgv_learning_function", "make_tgv_learning_function"]


@functools.lru_cache(maxsize=8)
def _step_fn(maxiter: int, gamma: float, cg_tol: float, cg_maxiter: int,
             tau0: float, sigma0: float, tol, check_every: int,
             backend: str):
    solve = make_diff_tgv_denoise(maxiter=maxiter, gamma=gamma,
                                  cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                                  tau0=tau0, sigma0=sigma0, tol=tol,
                                  check_every=check_every, backend=backend)

    @jax.jit
    def step(x, utrue, f):
        def cost_fn(x_):
            if x_.ndim == 3:   # (m, n, 2) patch grids → upsample (the
                # pullback to the grids rides AD through the linear PatchOp)
                from ..ops import PatchOp
                pop = PatchOp(tuple(x_.shape[:2]), tuple(f.shape[-2:]))
                alphas = (pop.apply(x_[..., 0]), pop.apply(x_[..., 1]))
            else:
                alphas = (x_[0], x_[1])
            u = solve(f, alphas)
            return 0.5 * jnp.sum((u - utrue) ** 2), u

        (cost, u), grad = jax.value_and_grad(cost_fn, has_aux=True)(x)
        return u, cost, grad

    return step


def tgv_learning_function(x, ds, delta, *, maxiter: int = 5000,
                          gamma: float = 1e-4, cg_tol: float = 1e-6,
                          cg_maxiter: int = 400, tau0: float = 0.99,
                          sigma0: float = 0.99, tol=None,
                          check_every: int = 500, backend: str = "jnp"):
    """L4 learning function for TGV² denoising.

    Args:
      x: parameter 2-vector ``[α₁, α₀]`` (first-order, second-order weight)
        or an (m, n, 2) stack of patch grids for spatially-varying weights
        (the TGV analogue of the reference's patch parameterization,
        ``src/TVLearningFunctionVec.jl:57-70``).
      ds: ``(true_images, noisy_images)`` stacks of shape (O, M, N).
      delta: trust-region radius (contract compatibility; the smoothed
        hypergradient has no exact/regularized switch).

    Returns ``(u, cost, grad)`` with scalar cost ½Σ‖u−ū‖² and ``grad``
    shaped like ``x``.
    """
    del delta
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x = jnp.asarray(x, utrue.dtype)
    if x.shape != (2,) and not (x.ndim == 3 and x.shape[-1] == 2):
        raise ValueError(f"TGV parameter must be a length-2 vector "
                         f"[alpha1, alpha0] or an (m, n, 2) patch stack, "
                         f"got shape {x.shape}")
    step = _step_fn(int(maxiter), float(gamma), float(cg_tol),
                    int(cg_maxiter), float(tau0), float(sigma0),
                    None if tol is None else float(tol), int(check_every),
                    str(backend))
    u, cost, grad = step(x, utrue, f)
    if squeeze:
        u = u[0]
    return u, cost, grad


def make_tgv_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``."""

    def lf(x, ds, delta, **overrides):
        kw = dict(defaults)
        kw.update(overrides)
        return tgv_learning_function(x, ds, delta, **kw)

    return lf
