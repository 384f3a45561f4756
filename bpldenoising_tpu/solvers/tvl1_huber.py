"""Huber-smoothed TV-L1: the differentiable route to bilevel learning.

The plain TV-L1 model (:mod:`.tvl1`) has a solution path that is piecewise
constant in the weight α on piecewise-constant images (contrast invariance:
structures are removed by *scale*, so u(α) jumps between plateaus and both
finite differences and any implicit derivative are zero or undefined).  The
standard remedy — and the DESIGN.md "TV-L1" scope note's prescribed route —
is to smooth BOTH nonsmooth terms with Huber functions and differentiate
the smoothed problem:

    min_u  Σ_pix h_{γ_d}(u − f)  +  Σ_pix α · ψ_{γ_r}(|(∇u)_pix|₂)

where h_γ / ψ_γ are Huber in the repo's slope convention (quadratic with
slope γ on |r| ≤ 1/γ, linear outside — the same convention as the
γ-regularized branch of :mod:`.hypergrad`, ref
``src/TVLearningFunctionVec.jl:137-161``).  The smoothed energy is C² away
from a measure-zero set and strictly convex wherever the data Hessian
D = diag(h''_{γ_d}(u−f)) is positive, so the implicit function theorem
applies:

    H du/dα = −∇ᵀ ψ'_{γ_r}(∇u),     H = D + ∇ᵀ (α W) ∇,

with W the per-pixel Huber curvature block already assembled by
:func:`..solvers.hypergrad.build_reg_system` — the ONLY difference from
the quadratic-data-term (TV-L2) adjoint system is that the identity data
block becomes the diagonal D (γ_d on small residuals, 0 on outliers).
The hypergradient is the usual dual-space contraction dJ/dα = ⟨∇p, ψ'(∇u)⟩
with H p = ū − u.

Inner solver: unaccelerated primal–dual splitting like :mod:`.tvl1` (the
Huber data term is smooth but still not strongly convex on the outlier
set), with two closed-form resolvents:

    primal  prox_{τ h_{γ_d}(·−f)}(v) = f + P(v − f),
            P(z) = z/(1+τγ_d)        if |z| ≤ 1/γ_d + τ,
                   z − τ·sign(z)     otherwise;
    dual    y⁺ = Π_{|·|₂ ≤ α}( ỹ / (1 + σ/(α γ_r)) )

(the dual scaling is the resolvent of the conjugate (α ψ_{γ_r}(|·|))* =
|y|²/(2αγ_r) + ι_{|y|≤α}; as γ_r → ∞ it degenerates to the plain
projection and as γ_d → ∞ the primal prox degenerates to the TV-L1
shrinkage — both limits are pinned by test against :mod:`.tvl1`).

TPU discipline matches :mod:`.tvl1`: one ``fori_loop`` under one ``jit``,
batch on leading axes, warm-start ``state0`` chaining, chunked early stop;
own module so no pinned trace path moves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..models import DenoiseModel, tv_model
from ..ops import proj_norm21_ball, scalarprod, xi
from .hypergrad import HypergradConfig, _defaults, build_reg_system
from .krylov import cg

__all__ = [
    "tvl1_huber_denoise",
    "tvl1_huber_energy",
    "tvl1_huber_hypergrad",
    "tvl1_huber_implicit_cotangents",
    "make_diff_tvl1_denoise",
    "diff_tvl1_denoise",
]

_TV = tv_model()
_GRAD = _TV.ops[0]


def _huber(r, gamma):
    """Huber penalty, slope convention: γr²/2 on |r| ≤ 1/γ, |r| − 1/(2γ)."""
    a = jnp.abs(r)
    return jnp.where(a <= 1.0 / gamma, 0.5 * gamma * r * r,
                     a - 0.5 / gamma)


def tvl1_huber_energy(u, f, alpha, *, gamma_d, gamma_r):
    """Smoothed primal energy Σ h_{γd}(u−f) + Σ α·ψ_{γr}(|∇u|₂)
    (per batch element)."""
    dtype = u.dtype
    gamma_d = jnp.asarray(gamma_d, dtype)
    gamma_r = jnp.asarray(gamma_r, dtype)
    e = jnp.sum(_huber(u - f, gamma_d), axis=(-2, -1))
    n = _huber(xi(_GRAD.apply(u)), gamma_r)
    a = jnp.asarray(alpha, dtype)
    return e + jnp.sum(a * n, axis=(-2, -1))


def _huber_prox(z, tau, gamma):
    """prox of τ·h_γ (slope convention): interior scaling, exterior shrink."""
    return jnp.where(jnp.abs(z) <= 1.0 / gamma + tau,
                     z / (1.0 + tau * gamma),
                     z - tau * jnp.sign(z))


@functools.partial(
    jax.jit, static_argnames=("maxiter", "check_every", "return_dual"))
def _tvl1_huber_impl(f, alpha, state0, *, gamma_d, gamma_r, tau, sigma,
                     maxiter: int, tol, check_every: int,
                     return_dual: bool):
    dtype = f.dtype
    tau = jnp.asarray(tau, dtype)
    sigma = jnp.asarray(sigma, dtype)
    gamma_d = jnp.asarray(gamma_d, dtype)
    gamma_r = jnp.asarray(gamma_r, dtype)
    a = jnp.asarray(alpha, dtype)
    # dual Huber scaling 1/(1 + σ/(αγ_r)); α=0 pixels project to y=0 anyway,
    # so the floor only guards the division
    a_safe = jnp.maximum(a, jnp.asarray(1e-12, dtype))
    scale = 1.0 / (1.0 + sigma / (a_safe * gamma_r))
    if jnp.ndim(a) >= 2:
        scale = scale[..., None, :, :]   # broadcast over the component axis

    if state0 is not None:
        u0, y0 = state0
    else:
        u0 = f
        y0 = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) \
            + 0.0 * f[..., None, :, :]

    def step(carry):
        u, y = carry
        v = u - tau * _GRAD.apply_adjoint(y)
        u_new = f + _huber_prox(v - f, tau, gamma_d)
        ubar = 2.0 * u_new - u
        y_new = proj_norm21_ball(scale * (y + sigma * _GRAD.apply(ubar)), a)
        return u_new, y_new

    if tol is None:
        u, y = lax.fori_loop(0, maxiter, lambda k, c: step(c), (u0, y0))
    else:
        tol_ = jnp.asarray(tol, dtype)

        def chunk(c):
            (u, y), it, _ = c
            u_prev = u
            n = jnp.minimum(check_every, maxiter - it)
            u, y = lax.fori_loop(0, n, lambda k, s: step(s), (u, y))
            num = jnp.sum((u - u_prev) ** 2)
            den = jnp.maximum(jnp.sum(u ** 2), jnp.asarray(1e-24, dtype))
            return (u, y), it + n, jnp.sqrt(num / den)

        def cond(c):
            _, it, delta = c
            return jnp.logical_and(it < maxiter, delta > tol_)

        (u, y), _, _ = lax.while_loop(
            cond, chunk, ((u0, y0), jnp.asarray(0),
                          jnp.asarray(jnp.inf, dtype)))

    if return_dual:
        return u, (u, y)
    return u


def tvl1_huber_denoise(f, alpha, *, gamma_d: float = 100.0,
                       gamma_r: float = 1000.0, tau0: float = 0.99,
                       sigma0: float = 0.99, maxiter: int = 5000,
                       tol=None, check_every: int = 500, state0=None,
                       return_dual: bool = False):
    """Huber-smoothed TV-L1 denoising of an image or (O, M, N) batch at
    weight ``alpha`` (scalar or (M, N) map).

    ``gamma_d`` / ``gamma_r`` are the data / regularizer Huber slopes
    (width 1/γ); both → ∞ recovers :func:`.tvl1.tvl1_denoise` exactly.
    ``state0`` / ``return_dual`` chain the (u, y) state across calls.
    """
    f = jnp.asarray(f)
    alpha = jnp.asarray(alpha, f.dtype)
    L = float(_TV.opnorm_sq()) ** 0.5
    if state0 is not None:
        state0 = tuple(jnp.asarray(s, f.dtype) for s in state0)
    return _tvl1_huber_impl(
        f, alpha, state0, gamma_d=float(gamma_d), gamma_r=float(gamma_r),
        tau=float(tau0) / L, sigma=float(sigma0) / L, maxiter=int(maxiter),
        tol=None if tol is None else float(tol),
        check_every=int(check_every), return_dual=bool(return_dual))


# ---------------------------------------------------------------------------
# Hypergradient of the smoothed problem (implicit differentiation)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model", "cfg", "want_maps"))
def tvl1_huber_hypergrad(u, f, utrue, alphas, model: DenoiseModel = _TV,
                         cfg: HypergradConfig = HypergradConfig(),
                         want_maps: bool = False, p0=None, *,
                         gamma_d):
    """Implicit-differentiation hypergradient of the Huber-smoothed TV-L1
    problem: dJ/dα for J(α) = ½‖u(α) − ū‖².

    Identical to :func:`..solvers.hypergrad.reg_hypergrad` except the
    adjoint system's identity data block (the quadratic term's Hessian)
    is replaced by the Huber data Hessian
    D = diag(γ_d · 1{|u−f| ≤ 1/γ_d}): H p = ū − u with
    H = D + Σₖ Gₖᵀ αₖ Wₖ Gₖ, then dJ/dαₖ = ⟨Gₖp, ψ'_{γr}(Gₖu)⟩.
    The TV smoothing slope is ``cfg.gamma``; ``u`` must solve the SAME
    smoothed problem (:func:`tvl1_huber_denoise` with
    ``gamma_r = cfg.gamma`` and the same ``gamma_d``).

    D vanishes on outlier pixels, so H is only PSD in general; in practice
    the uncorrupted majority keeps it definite and the Jacobi diagonal is
    floored to guard the preconditioner.  Shape-polymorphic over leading
    batch axes (joint CG over the whole stack — global inner products).

    Returns ``(grads, p, info)`` like the TV-L2 hypergradients; grads are
    per-k scalars (summed over every axis) or (…, M, N) maps.
    """
    dtype = u.dtype
    _, _, cg_tol = _defaults(dtype, cfg)
    gamma_d = jnp.asarray(gamma_d, dtype)

    M0, inv_diag0, fields = build_reg_system(u, alphas, model, cfg.gamma)
    d = jnp.where(jnp.abs(u - f) <= 1.0 / gamma_d, gamma_d,
                  jnp.asarray(0.0, dtype))

    def M_apply(p):
        # build_reg_system's operator is I + Σ GᵀαWG; swap I for D
        return M0(p) + (d - 1.0) * p

    diag = 1.0 / inv_diag0 + (d - 1.0)
    inv_diag = 1.0 / jnp.maximum(diag, jnp.asarray(1e-12, dtype))

    rhs = utrue - u
    p, info = cg(M_apply, rhs, x0=p0, tol=cg_tol, maxiter=cfg.cg_maxiter,
                 M=lambda r: inv_diag * r)

    grads = []
    for op, field in zip(model.ops, fields):
        gmap = scalarprod(op.apply(p), field)
        grads.append(gmap if want_maps else jnp.sum(gmap))
    return tuple(grads), p, info


# ---------------------------------------------------------------------------
# Implicit-diff layer (custom_vjp) — gradients flow to f and α
# ---------------------------------------------------------------------------

def tvl1_huber_implicit_cotangents(u, f, alpha, v, *, gamma_d,
                                   gamma: float = 1000.0,
                                   cg_tol: float | None = 1e-6,
                                   cg_maxiter: int = 1000,
                                   lam0=None, return_lam: bool = False):
    """Implicit-function-theorem cotangents at a smoothed TV-L1 solution.

    Given the loss cotangent ``v = ∂J/∂u`` (shaped like u), solves the
    smoothed adjoint system H λ = v once (per-image CG dots — grouping-
    invariant under sharding, cf. :func:`.vtv.vtv_implicit_cotangents`)
    and returns ``(df, dα)``: df = D λ with D the Huber data Hessian
    (du/df = H⁻¹D, vs H⁻¹·I for the quadratic data term), and
    dα = −⟨∇λ, ψ'(∇u)⟩ reduced to the shape of ``alpha`` (scalar or
    (M, N) map).
    """
    from .krylov import cg_batched
    dtype = u.dtype
    if cg_tol is None:   # dtype-based default, same rule as _defaults
        cg_tol = 1e-8 if dtype == jnp.float64 else 1e-5
    a = jnp.asarray(alpha, dtype)
    gamma_d = jnp.asarray(gamma_d, dtype)

    M0, inv_diag0, fields = build_reg_system(u, (a,), _TV, gamma)
    d = jnp.where(jnp.abs(u - f) <= 1.0 / gamma_d, gamma_d,
                  jnp.asarray(0.0, dtype))

    def H(x):
        return M0(x) + (d - 1.0) * x

    diag = jnp.maximum(1.0 / inv_diag0 + (d - 1.0),
                       jnp.asarray(1e-12, dtype))
    lam, _ = cg_batched(H, v, x0=lam0, tol=cg_tol, maxiter=cg_maxiter,
                        M=lambda r: r / diag, item_ndim=2)

    g_map = -scalarprod(_GRAD.apply(lam), fields[0])
    if a.ndim >= 2:
        da = jnp.sum(g_map.reshape((-1,) + g_map.shape[-2:]),
                     axis=0).astype(a.dtype)
    else:
        da = jnp.sum(g_map).astype(a.dtype)
    df = d * lam
    out = df, da
    return out + (lam,) if return_lam else out


def make_diff_tvl1_denoise(maxiter: int = 5000, gamma_d: float = 100.0,
                           gamma: float = 1000.0,
                           cg_tol: float | None = None,
                           cg_maxiter: int = 2000, tau0: float = 0.99,
                           sigma0: float = 0.99, tol=None,
                           check_every: int = 500):
    """Differentiable Huber-smoothed TV-L1 denoiser ``(f, α) → u``
    (batched; gradients flow to f and α through one CG solve — the
    impulse-noise companion of :func:`.vtv.make_diff_vtv_denoise`).
    ``cg_tol=None`` derives the adjoint tolerance from the dtype
    (1e-8 f64 / 1e-5 f32) and ``cg_maxiter`` defaults to 2000 — the same
    accuracy settings as the single-device
    :func:`..learning.tvl1.tvl1_learning_function`, so data-parallel and
    single-device runs agree at defaults."""
    L = float(_TV.opnorm_sq()) ** 0.5

    def _fsolve(f, alpha):
        return _tvl1_huber_impl(
            f, alpha, None, gamma_d=gamma_d, gamma_r=gamma,
            tau=tau0 / L, sigma=sigma0 / L, maxiter=maxiter, tol=tol,
            check_every=check_every, return_dual=False)

    @jax.custom_vjp
    def solve(f, alpha):
        return _fsolve(f, alpha)

    def fwd(f, alpha):
        u = _fsolve(f, alpha)
        return u, (u, f, alpha)

    def bwd(res, v):
        u, f, alpha = res
        df, da = tvl1_huber_implicit_cotangents(
            u, f, alpha, v, gamma_d=gamma_d, gamma=gamma, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter)
        return df, da

    solve.defvjp(fwd, bwd)
    return solve


@functools.partial(jax.jit, static_argnames=("maxiter",))
def diff_tvl1_denoise(f, alpha, maxiter: int = 5000):
    """Differentiable TV-L1 denoising at the default smoothing (companion
    to ``diff_tv_denoise`` / ``diff_tgv_denoise`` / ``diff_vtv_denoise``)."""
    f = jnp.asarray(f)
    solve = make_diff_tvl1_denoise(maxiter=maxiter)
    return solve(f, jnp.asarray(alpha, f.dtype))
