"""TGV² denoising: primal–dual solver + differentiable layer.

Beyond-reference model family (the reference's regularizers are all
first-order TV-type, ``src/TVLearningFunctionVec.jl`` /
``src/SumRegsLearningFunction.jl``).  Second-order total generalized
variation (Bredies–Kunisch–Pock 2010) solves

    min_{u,w}  ½‖u − f‖² + α₁‖∇u − w‖_{2,1} + α₀‖E w‖_{2,1}

over an auxiliary vector field w (E = symmetrized gradient,
:mod:`..ops.tgv`), removing TV's staircasing: piecewise-AFFINE images are
reconstructed exactly where TV flattens them.

Solver: Chambolle–Pock on the saddle form with joint primal x = (u, w)
and duals (p, q) for K(u, w) = (∇u − w, E w):

    u⁺ = (u − τ ∇ᵀp + τ f) / (1 + τ)          (data prox)
    w⁺ = w + τ (p − Eᵀ q)                       (no prox)
    (ū, w̄) = 2(u⁺, w⁺) − (u, w)
    p⁺ = Π_{|·|≤α₁}(p + σ(∇ū − w̄))
    q⁺ = Π_{|·|≤α₀}(q + σ E w̄)

with τσ‖K‖² < 1, ‖K‖² ≤ 12.  No acceleration: the data term is strongly
convex in u only, so the Chambolle–Pock γ-scheme the TV solver uses
(``solvers/pdps.py``) does not apply to the joint primal.  TPU-first like
the TV path: the whole iteration is one ``lax.fori_loop`` of fused
elementwise/stencil VPU work, batch rides leading axes by broadcasting
(no vmap), optional chunked early stop, warm-startable state.

Differentiable layer: :func:`make_diff_tgv_denoise` wraps the solver in
``jax.custom_vjp`` whose backward pass applies the implicit function
theorem to the γ-Huber-smoothed joint optimality system (the TGV analogue
of :mod:`.implicit`):

    F_u = u − f + α₁ ∇ᵀψ_γ(∇u − w)               = 0
    F_w = −α₁ ψ_γ(∇u − w) + α₀ Eᵀψ_γ(E w)        = 0

One Jacobi-preconditioned CG solve on the symmetric positive-definite
joint Hessian (3 stacked planes: u + 2 w-components) yields cotangents
for f, α₁ and α₀ simultaneously — no unrolling of the 5000-iteration
forward solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import FwdGradientOp, proj_norm21_ball, scalarprod, xi
from ..ops.grad import dminus_gram
from ..ops.tgv import TGV_OPNORM_SQ, sym_div, sym_grad
from .krylov import cg_batched

__all__ = ["tgv_denoise_pdps", "tgv_energy", "make_diff_tgv_denoise",
           "diff_tgv_denoise", "TGV_PDPS_DEFAULTS"]

_GRAD = FwdGradientOp()

TGV_PDPS_DEFAULTS = dict(tau0=0.99, sigma0=0.99, maxiter=5000)


def _step(f, a1, a0, tau, sigma, state):
    u, w, p, q = state
    u_new = (u - tau * _GRAD.apply_adjoint(p) + tau * f) / (1.0 + tau)
    w_new = w + tau * (p - sym_div(q))
    ubar = 2.0 * u_new - u
    wbar = 2.0 * w_new - w
    p_new = proj_norm21_ball(p + sigma * (_GRAD.apply(ubar) - wbar), a1)
    q_new = proj_norm21_ball(q + sigma * sym_grad(wbar), a0)
    return (u_new, w_new, p_new, q_new)


@functools.partial(jax.jit, static_argnames=("maxiter", "check_every",
                                             "return_state"))
def _tgv_impl(f, a1, a0, state0=None, *, tau0, sigma0, maxiter: int,
              tol, check_every: int, return_state: bool):
    dtype = f.dtype
    L = jnp.sqrt(jnp.asarray(TGV_OPNORM_SQ, dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L
    a1 = jnp.asarray(a1, dtype)
    a0 = jnp.asarray(a0, dtype)

    if state0 is not None:
        state = state0
    else:
        # 0·f-seeded zeros: keeps shard_map varying-type, as in pdps.py
        zf = 0.0 * f[..., None, :, :]
        vec = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) + zf
        ten = jnp.zeros(f.shape[:-2] + (3,) + f.shape[-2:], dtype) + zf
        state = (f, vec, vec, ten)

    step = functools.partial(_step, f, a1, a0, tau, sigma)

    if tol is None:
        state = lax.fori_loop(0, maxiter, lambda k, s: step(s), state)
        iters = jnp.asarray(maxiter)
    else:
        tol_ = jnp.asarray(tol, dtype)

        def chunk(carry):
            st, it, _ = carry
            u_prev = st[0]
            n = jnp.minimum(check_every, maxiter - it)
            st = lax.fori_loop(0, n, lambda k, s: step(s), st)
            du = jnp.sqrt(jnp.sum((st[0] - u_prev) ** 2))
            ref = jnp.maximum(jnp.sqrt(jnp.sum(u_prev ** 2)), 1.0)
            return st, it + n, du / ref

        def cond(carry):
            _, it, rel = carry
            return jnp.logical_and(it < maxiter, rel > tol_)

        state, iters, _ = lax.while_loop(
            cond, chunk, (state, jnp.asarray(0), jnp.asarray(jnp.inf, dtype)))

    u, w = state[0], state[1]
    if return_state:
        return u, w, state, iters
    return u, w, iters


def tgv_denoise_pdps(f, alpha1, alpha0, *, tau0=0.99, sigma0=0.99,
                     maxiter: int = 5000, tol=None, check_every: int = 500,
                     state0=None, return_state: bool = False):
    """Batched TGV² denoising of an ``(..., M, N)`` stack.

    Args:
      alpha1: weight on ‖∇u − w‖₂,₁ (the TV-like first-order term).
      alpha0: weight on ‖E w‖₂,₁ (the second-order term).
      tol / check_every: optional chunked early stop on the relative
        u-increment (same scheme as :func:`..solvers.denoise_pdps`).
      state0 / return_state: warm-start state ``(u, w, p, q)``.

    Returns ``(u, w)``; with ``return_state``, ``(u, w, state, iters)``.
    """
    f = jnp.asarray(f)
    out = _tgv_impl(f, alpha1, alpha0, state0, tau0=tau0, sigma0=sigma0,
                    maxiter=int(maxiter), tol=tol,
                    check_every=int(check_every),
                    return_state=bool(return_state))
    if return_state:
        return out
    u, w, _ = out
    return u, w


def tgv_energy(f, u, w, alpha1, alpha0):
    """Primal TGV² energy per image: (..., M, N) → (...).  ``alpha1`` /
    ``alpha0`` are scalars or (M, N) maps (spatially-varying weights)."""
    fid = 0.5 * jnp.sum((u - f) ** 2, axis=(-2, -1))
    t1 = jnp.sum(alpha1 * xi(_GRAD.apply(u) - w), axis=(-2, -1))
    t0 = jnp.sum(alpha0 * xi(sym_grad(w)), axis=(-2, -1))
    return fid + t1 + t0


# ---------------------------------------------------------------------------
# implicit differentiation (smoothed joint system)
# ---------------------------------------------------------------------------

def _dpsi(field, gamma):
    """γ-Huber gradient ψ and its Jacobian action at ``field``.

    ψ(y) = y / max(|y|, γ);  Dψ(d) = s·d − 1[|y|≥γ]·y (y·d) s³ with
    s = 1/max(|y|, γ) (for |y| < γ the map is linear, s = 1/γ).
    """
    nrm = xi(field)
    dtype = field.dtype
    s = 1.0 / jnp.maximum(nrm, jnp.asarray(gamma, dtype))
    mask = (nrm >= gamma).astype(dtype)
    psi = field * s[..., None, :, :]

    def jac(d):
        rad = mask * scalarprod(field, d) * s ** 3
        return s[..., None, :, :] * d - field * rad[..., None, :, :]

    return psi, s, jac


def _amul(a, field):
    """Multiply a (..., C, M, N) field by a scalar or (M, N)-map weight."""
    return field * (a[..., None, :, :] if jnp.ndim(a) >= 2 else a)


def _build_joint_system(u, w, a1, a0, gamma):
    """SPD joint Hessian H of the smoothed energy at (u, w), its Jacobi
    diagonal, and the ψ fields for the α-cotangents.  Stacked layout:
    plane 0 = u, planes 1:3 = w.  ``a1``/``a0`` may be (M, N) maps: the
    spatially-varying weight sits INSIDE the stencil adjoints
    (∇ᵀ(a₁ψ), Eᵀ(a₀ψ)), which keeps H symmetric (a·diagonal commutes with
    the pointwise Dψ but not with the stencils)."""
    y = _GRAD.apply(u) - w
    z = sym_grad(w)
    psi_y, s_y, Dy = _dpsi(y, gamma)
    psi_z, s_z, Dz = _dpsi(z, gamma)

    def H(x):
        du = x[..., 0, :, :]
        dw = x[..., 1:3, :, :]
        a1hy = _amul(a1, Dy(_GRAD.apply(du) - dw))
        a0hz = _amul(a0, Dz(sym_grad(dw)))
        Hu = du + _GRAD.apply_adjoint(a1hy)
        Hw = -a1hy + sym_div(a0hz)
        return jnp.concatenate([Hu[..., None, :, :], Hw], axis=-3)

    # Jacobi preconditioner (isotropic approximation: the rank-one part of
    # Dψ is dropped, exact where |y| < γ)
    a1sy = a1 * s_y   # s_y/s_z are per-pixel (..., M, N): plain products
    a0sz = a0 * s_z
    sy2 = jnp.stack([a1sy, a1sy], axis=-3)
    diag_u = 1.0 + _GRAD.gram_diag(sy2)
    e_r = dminus_gram(a0sz, -2) + 0.5 * dminus_gram(a0sz, -1)
    e_c = dminus_gram(a0sz, -1) + 0.5 * dminus_gram(a0sz, -2)
    diag = jnp.concatenate(
        [diag_u[..., None, :, :],
         jnp.stack([a1sy + e_r, a1sy + e_c], axis=-3)], axis=-3)
    return H, diag, psi_y, psi_z


def tgv_implicit_cotangents(u, w, alphas, v, *, gamma: float = 1e-4,
                            cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                            lam0=None, return_lam: bool = False,
                            return_info: bool = False):
    """Implicit-function-theorem cotangents at a TGV solution (u, w).

    Given the loss cotangent ``v = ∂J/∂u``, solves the SPD smoothed joint
    system once and returns ``(df, (dα₁, dα₀))`` — the same rule the
    ``custom_vjp`` layer applies, exposed directly so the learning function
    can pair it with a WARM-STARTED forward solve (the IFT evaluates at the
    returned solution, so how the solver got there is irrelevant).

    ``lam0`` warm-starts the adjoint CG from a previous evaluation's
    multiplier (``return_lam=True`` appends it to the return) — the fused
    trust-region loop chains it across evaluations, where consecutive
    systems differ only by a small (u, w, α) perturbation.
    ``return_info=True`` additionally appends the solve's
    :class:`.krylov.KrylovInfo` (adjoint-CG convergence telemetry)."""
    a1 = jnp.asarray(alphas[0], u.dtype)
    a0 = jnp.asarray(alphas[1], u.dtype)
    H, diag, psi_y, psi_z = _build_joint_system(u, w, a1, a0, gamma)
    rhs = jnp.concatenate([v[..., None, :, :], jnp.zeros_like(w)], axis=-3)
    # per-image inner products (item_ndim=3 → the (3, M, N) stacked planes):
    # every image's adjoint solve is independent of how the batch is grouped,
    # so data-parallel shards reproduce the joint solve exactly
    lam, info = cg_batched(H, rhs, x0=lam0, tol=cg_tol, maxiter=cg_maxiter,
                           M=lambda r: r / diag, item_ndim=3)
    lu = lam[..., 0, :, :]
    lw = lam[..., 1:3, :, :]

    def reduce_like(g, a):
        # per-pixel sensitivity map → cotangent shaped like the weight:
        # batch-sum for an (M, N) map, full sum for a scalar
        if jnp.ndim(a) >= 2:
            return jnp.sum(g.reshape((-1,) + g.shape[-2:]),
                           axis=0).astype(a.dtype)
        return jnp.sum(g).astype(a.dtype)

    g1 = -scalarprod(psi_y, _GRAD.apply(lu) - lw)
    g0 = -scalarprod(psi_z, sym_grad(lw))
    out = lu, (reduce_like(g1, a1), reduce_like(g0, a0))
    if return_lam:
        out = out + (lam,)
    if return_info:
        out = out + (info,)
    return out


def make_diff_tgv_denoise(maxiter: int = 5000, gamma: float = 1e-4,
                          cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                          tau0: float = 0.99, sigma0: float = 0.99,
                          tol=None, check_every: int = 500,
                          backend: str = "jnp", interpret: bool = False):
    """Differentiable TGV denoiser ``(f, (α₁, α₀)) → u`` (batched; gradients
    flow to f and both weights through one joint CG solve).

    ``backend="pallas"`` runs the forward solve in the fused VMEM-resident
    kernel (:mod:`.tgv_pallas`, ~2.2× device throughput); the implicit
    backward CG is stencil-light and stays on the XLA path either way.
    """
    if backend == "pallas":
        from .tgv_pallas import tgv_denoise_pdps_pallas

        def _fsolve(f, alphas):
            if all(jnp.ndim(a) in (0, 2) for a in alphas):
                return tgv_denoise_pdps_pallas(
                    f, alphas[0], alphas[1], tau0=tau0, sigma0=sigma0,
                    maxiter=maxiter, tol=tol, check_every=check_every,
                    interpret=interpret)
            # kernel takes scalars / (M, N) maps; other broadcastable
            # weight shapes (e.g. per-image stacks) keep the jnp path
            return tgv_denoise_pdps(f, alphas[0], alphas[1], tau0=tau0,
                                    sigma0=sigma0, maxiter=maxiter, tol=tol,
                                    check_every=check_every)
    else:
        def _fsolve(f, alphas):
            return tgv_denoise_pdps(f, alphas[0], alphas[1], tau0=tau0,
                                    sigma0=sigma0, maxiter=maxiter, tol=tol,
                                    check_every=check_every)

    @jax.custom_vjp
    def solve(f, alphas):
        u, _ = _fsolve(f, alphas)
        return u

    def fwd(f, alphas):
        u, w = _fsolve(f, alphas)
        return u, (u, w, alphas)

    def bwd(res, v):
        u, w, alphas = res
        df, dalphas = tgv_implicit_cotangents(
            u, w, alphas, v, gamma=gamma, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter)
        return df, dalphas

    solve.defvjp(fwd, bwd)
    return solve


@functools.partial(jax.jit, static_argnames=("maxiter",))
def diff_tgv_denoise(f, alpha1, alpha0, maxiter: int = 5000):
    """Differentiable TGV² denoising (companion to
    :func:`..solvers.implicit.diff_tv_denoise`): ``jax.grad`` flows
    through f, α₁ and α₀ at the cost of one CG solve."""
    f = jnp.asarray(f)
    solve = make_diff_tgv_denoise(maxiter=maxiter)
    return solve(f, (jnp.asarray(alpha1, f.dtype),
                     jnp.asarray(alpha0, f.dtype)))
