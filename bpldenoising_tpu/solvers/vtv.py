"""Vectorial (color) TV: implicit differentiation of the smoothed model.

Beyond-reference model family (the reference converts everything to
grayscale, ``src/BPLDenoising.jl:331-332``): images are ``(..., C, M, N)``
stacks and the regularizer couples channels through a per-pixel FROBENIUS
norm over (channel, component),

    min_u  ½‖u − f‖² + Σ_pix α·‖(∇u)_pix‖_F ,

the standard channel-coupled vectorial TV (Bresson–Chan).  The forward
solve is the generic :func:`..solvers.pdps.denoise_pdps` on
:func:`..models.vtv_model` (the coupling lives in the dual projection
axes); a fused VMEM-resident Pallas kernel lives in :mod:`.vtv_pallas`.

The hypergradient mirrors the TGV design (:mod:`.tgv`): implicit
differentiation of the γ-Huber smoothed optimality system

    F(u; α, f) = u − f + ∇ᵀ(α ψ(∇u)) = 0,   ψ(y) = y / max(‖y‖_F, γ),

one Jacobi-preconditioned CG solve over the C stacked channel planes with
PER-IMAGE inner products (grouping-invariant under data parallelism).
There is no exact active-set branch — the smoothed gradient is the
vectorial analogue of the reference's γ-regularized branch
(``src/TVLearningFunctionVec.jl:137-161``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import FwdGradientOp, scalarprod, xi
from ..models import vtv_model
from .krylov import cg_batched
from .pdps import denoise_pdps

__all__ = ["vtv_implicit_cotangents", "make_diff_vtv_denoise",
           "diff_vtv_denoise"]

_GRAD = FwdGradientOp()
_VTV = vtv_model()
_AXES = (-4, -3)   # (channel, component) — the Frobenius coupling


def _dpsi_coupled(field, gamma):
    """γ-Huber gradient ψ and its Jacobian action at a coupled field.

    ``field`` is (..., C, 2, M, N); the norm couples (channel, component):
    ψ(y) = y / max(‖y‖_F, γ);  Dψ(d) = s·d − 1[‖y‖≥γ]·y (y·d)_F s³ with
    s = 1/max(‖y‖_F, γ).  The rank-one term ties ALL channels of a pixel
    together — the vectorial coupling the per-channel TV Hessian lacks.
    """
    nrm = xi(field, axes=_AXES)
    dtype = field.dtype
    s = 1.0 / jnp.maximum(nrm, jnp.asarray(gamma, dtype))
    mask = (nrm >= gamma).astype(dtype)
    psi = field * s[..., None, None, :, :]

    def jac(d):
        rad = mask * scalarprod(field, d, axes=_AXES) * s ** 3
        return (s[..., None, None, :, :] * d
                - field * rad[..., None, None, :, :])

    return psi, s, jac


def vtv_implicit_cotangents(u, alpha, v, *, gamma: float = 1e-4,
                            cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                            lam0=None, return_lam: bool = False,
                            return_info: bool = False):
    """Implicit-function-theorem cotangents at a VTV solution ``u``.

    Given the loss cotangent ``v = ∂J/∂u`` (shaped like u, (..., C, M, N)),
    solves the SPD smoothed system H λ = v once and returns ``(df, dα)``
    with ``dα`` shaped like ``alpha`` (scalar or (M, N) map).  ``lam0``
    warm-starts the adjoint CG (``return_lam=True`` appends the multiplier)
    — the same chaining discipline as :func:`.tgv.tgv_implicit_cotangents`;
    ``return_info=True`` appends the solve's :class:`.krylov.KrylovInfo`.
    """
    a = jnp.asarray(alpha, u.dtype)
    g = _GRAD.apply(u)                       # (..., C, 2, M, N)
    psi, s, Dj = _dpsi_coupled(g, gamma)

    def H(x):
        # α is a scalar or an (M, N) map; either broadcasts onto the
        # (..., C, 2, M, N) field, and multiplying INSIDE the stencil
        # adjoint keeps H symmetric (see .tgv._build_joint_system).
        return x + _GRAD.apply_adjoint(a * Dj(_GRAD.apply(x)))

    # Jacobi preconditioner (isotropic part of Dψ); s is per-pixel and
    # channel-shared, so one (..., M, N) diagonal serves every channel.
    a_s = a * s
    diag = (1.0 + _GRAD.gram_diag(jnp.stack([a_s, a_s], axis=-3)))
    diag = diag[..., None, :, :]             # broadcast over channels

    lam, info = cg_batched(H, v, x0=lam0, tol=cg_tol, maxiter=cg_maxiter,
                           M=lambda r: r / diag, item_ndim=3)

    g_map = -scalarprod(psi, _GRAD.apply(lam), axes=_AXES)   # (..., M, N)
    if a.ndim >= 2:
        da = jnp.sum(g_map.reshape((-1,) + g_map.shape[-2:]),
                     axis=0).astype(a.dtype)
    else:
        da = jnp.sum(g_map).astype(a.dtype)
    out = lam, da
    if return_lam:
        out = out + (lam,)
    if return_info:
        out = out + (info,)
    return out


def make_diff_vtv_denoise(maxiter: int = 5000, gamma: float = 1e-4,
                          cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                          tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                          tol=None, check_every: int = 500,
                          backend: str = "jnp", interpret: bool = False):
    """Differentiable VTV denoiser ``(f, α) → u`` (batched ``(..., C, M, N)``;
    gradients flow to f and α through one coupled CG solve).

    ``backend="pallas"`` runs the forward solve in the fused channel-coupled
    kernel (:mod:`.vtv_pallas`); the implicit backward CG stays on the XLA
    stencil path either way.
    """
    if backend == "pallas":
        from .vtv_pallas import vtv_denoise_pdps_pallas

        def _fsolve(f, alpha):
            if jnp.ndim(alpha) in (0, 2):
                return vtv_denoise_pdps_pallas(
                    f, alpha, tau0=tau0, sigma0=sigma0, maxiter=maxiter,
                    tol=tol, check_every=check_every, interpret=interpret)
            return denoise_pdps(f, alpha, _VTV, tau0=tau0, sigma0=sigma0,
                                maxiter=maxiter, tol=tol,
                                check_every=check_every)
    else:
        def _fsolve(f, alpha):
            return denoise_pdps(f, alpha, _VTV, tau0=tau0, sigma0=sigma0,
                                maxiter=maxiter, tol=tol,
                                check_every=check_every)

    @jax.custom_vjp
    def solve(f, alpha):
        return _fsolve(f, alpha)

    def fwd(f, alpha):
        u = _fsolve(f, alpha)
        return u, (u, alpha)

    def bwd(res, v):
        u, alpha = res
        df, da = vtv_implicit_cotangents(u, alpha, v, gamma=gamma,
                                         cg_tol=cg_tol,
                                         cg_maxiter=cg_maxiter)
        return df, da

    solve.defvjp(fwd, bwd)
    return solve


@functools.partial(jax.jit, static_argnames=("maxiter",))
def diff_vtv_denoise(f, alpha, maxiter: int = 5000):
    """Differentiable vectorial-TV denoising (companion to
    :func:`.implicit.diff_tv_denoise` / :func:`.tgv.diff_tgv_denoise`)."""
    f = jnp.asarray(f)
    solve = make_diff_vtv_denoise(maxiter=maxiter)
    return solve(f, jnp.asarray(alpha, f.dtype))
