"""Differentiable denoising layers via implicit differentiation.

SURVEY.md §7 plans "optional implicit-diff via custom_vjp" alongside the
adjoint hypergradients — this module delivers it: :func:`diff_tv_denoise`
and :func:`diff_denoise` are ``jax.custom_vjp`` wrappers around the PDPS
solver whose backward pass applies the implicit function theorem to the
γ-Huber-smoothed optimality system instead of unrolling 5000 iterations
(which would be memory- and compute-prohibitive).

For u*(f, α) = argmin ½‖u−f‖² + Σₖ‖αₖGₖu‖₂,₁ with KKT residual
F(u, f, α) = u − f + Σₖ Gₖᵀ qₖ(Gₖu, αₖ) = 0:

* ∂F/∂u = M (the SPD reg-hypergradient system matrix),
* ∂F/∂f = −I  ⟹  vjp_f(v) = M⁻¹v,
* vjp_αₖ(v) = ⟨Gₖ M⁻¹v, dual field⟩ (the reg_hypergrad contraction).

One CG solve therefore yields the cotangents for *all* inputs, making the
denoiser usable as a layer inside arbitrary JAX computations
(``jax.grad``/``optax`` outer loops, plug-and-play priors, unrolled
networks) — a capability the reference does not have.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import DenoiseModel, tv_model
from ..ops import scalarprod
from .hypergrad import HypergradConfig, _defaults, build_reg_system
from .krylov import cg
from .pdps import denoise_pdps

__all__ = ["diff_denoise", "diff_tv_denoise"]


def _vjp_solve(u, v, alphas, model: DenoiseModel, cfg: HypergradConfig):
    """p = M⁻¹v for the γ-smoothed system at u (shared assembly from
    :func:`bpldenoising_tpu.solvers.hypergrad.build_reg_system`)."""
    _, _, cg_tol = _defaults(u.dtype, cfg)
    M_apply, inv_diag, fields = build_reg_system(u, alphas, model, cfg.gamma)
    p, _ = cg(M_apply, v, tol=cg_tol, maxiter=cfg.cg_maxiter,
              M=lambda r: inv_diag * r)
    return p, fields


def _alpha_cotangent(p, fields, alphas, model):
    """Per-k cotangent in the shape of αₖ (scalar or map)."""
    outs = []
    for op, field, alpha in zip(model.ops, fields, alphas):
        gmap = -scalarprod(op.apply(p), field)
        a = jnp.asarray(alpha)
        outs.append(gmap if a.ndim >= 2 else jnp.sum(gmap))
    return tuple(outs)


def make_diff_denoise(model: DenoiseModel, maxiter: int = 5000,
                      cfg: HypergradConfig = HypergradConfig()):
    """Build a differentiable single-image denoiser ``(f, alphas) -> u``."""

    @jax.custom_vjp
    def solve(f, alphas):
        return denoise_pdps(f, alphas, model, maxiter=maxiter)

    def fwd(f, alphas):
        u = solve(f, alphas)
        return u, (u, alphas)

    def bwd(res, v):
        u, alphas = res
        p, fields = _vjp_solve(u, v, alphas, model, cfg)
        df = p                                      # ∂F/∂f = −I ⇒ vjp = M⁻¹v
        dalphas = _alpha_cotangent(p, fields, alphas, model)
        return df, dalphas

    solve.defvjp(fwd, bwd)
    return solve


_TV = tv_model()


@functools.partial(jax.jit, static_argnames=("maxiter",))
def diff_tv_denoise(f, alpha, maxiter: int = 5000):
    """Differentiable TV denoising of one image (or batch via vmap).

    ``jax.grad`` flows through both ``f`` and ``alpha`` (scalar or map) at
    the cost of one extra CG solve — no unrolling.
    """
    solve = make_diff_denoise(_TV, maxiter=maxiter)
    u = solve(f, (jnp.asarray(alpha, jnp.asarray(f).dtype),))
    return u


def diff_denoise(f, alphas, model: DenoiseModel, maxiter: int = 5000,
                 cfg: HypergradConfig = HypergradConfig()):
    """General K-block differentiable denoiser (single image)."""
    solve = make_diff_denoise(model, maxiter=maxiter, cfg=cfg)
    return solve(jnp.asarray(f),
                 tuple(jnp.asarray(a) for a in model.canonical_alphas(alphas)))
