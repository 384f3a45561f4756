"""Fully-fused Pallas kernel for single-loop TV-L1 bilevel learning.

The TV-L1 analogue of :mod:`.first_order_pallas` /
:mod:`.first_order_vtv_pallas`: the ENTIRE optimization — every
Huber-smoothed CP step, every Jacobi-CG step on the smoothed adjoint
system, every (clipped) Adam update on log α — runs inside ONE kernel
launch with all state (u, dual pair, adjoint p, CG workspace,
parameter/moment scalars) VMEM-resident for the whole run.  Nothing
touches HBM between reading (f, ū) once and writing the result.

Scope: SINGLE-image problems with the scalar weight.  For one image the
jnp scan's per-image CG inner products coincide with global ones, so
:func:`..bilevel.first_order_tvl1.single_loop_tvl1_learn` is an EXACT
oracle (``tests/test_first_order_tvl1_pallas.py``); batched or patch
problems route to that scan (itself one dispatch).

In-kernel math mirrors the scan exactly:

* the smoothed PD step of :mod:`..solvers.tvl1_huber` (closed-form Huber
  data prox + the dual 1/(1+σ/(αγ_r)) scaling ahead of the α-ball
  projection);
* the smoothed adjoint system of ``first_order_tvl1``: the TV-L2
  γ_r-system of :func:`..solvers.hypergrad.build_reg_system` with its
  identity data block swapped for the Huber data Hessian
  ``diag(γ_d·1{|u−f| ≤ 1/γ_d})``;
* the elementwise clip on the log-α gradient (the family needs it: the
  Huber data Hessian vanishes on outlier pixels, so early unconverged
  states make the adjoint near-singular — module docstring of
  ``first_order_tvl1``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import tv_model
from ..solvers.pdps_pallas import (_STENCILS_FWD, _VMEM_LIMIT, _dplus,
                                   _dplus_T, _gram_axis, make_masks,
                                   schedule_salt)
from .first_order import _check_positive_x0

__all__ = ["single_loop_tvl1_pallas"]

_TV = tv_model()
# SMEM scalar layout:
# lr, gamma_d, gamma_r, tau, sigma, beta1, beta2, eps, clip, z_0
_N_SCALARS = 10

# live (M, N) planes: f, utrue, u, yx, yy, p, CG r/z/d + H-apply temps and
# the cached (Gu, act, inv_den) system pieces ≈ 14; Mosaic's allocator
# measured ~2-2.6× the naive estimate on the TV learner kernel, so keep
# headroom.
_PLANES = 16
_VMEM_BUDGET = 36 * 1024 * 1024


def _kernel(outer: int, n_inner: int, n_adj: int):
    def tvl1_learner_kernel(*refs):
        scalars_ref, f_ref, utrue_ref = refs[0], refs[1], refs[2]
        u_out, alpha_out, traj_ref = refs[3], refs[4], refs[5]

        f = f_ref[:]                      # (M, N)
        utrue = utrue_ref[:]
        dtype = f.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        floor = jnp.asarray(1e-12, dtype)
        masks = make_masks(f.shape)

        lr = scalars_ref[0]
        gamma_d = scalars_ref[1]
        gamma_r = scalars_ref[2]
        tau = scalars_ref[3]
        sigma = scalars_ref[4]
        beta1 = scalars_ref[5]
        beta2 = scalars_ref[6]
        eps = scalars_ref[7]
        clip = scalars_ref[8]
        z_0 = scalars_ref[9]

        def outer_step(i, carry):
            u, yx, yy, p, z, m, v = carry
            a = jnp.exp(z)
            a_safe = jnp.maximum(a, floor)
            scale = 1.0 / (1.0 + sigma / (a_safe * gamma_r))

            # 1) n_inner smoothed-TVL1 CP steps — solvers.tvl1_huber's
            #    step in plane form: Huber data prox (interior scaling,
            #    exterior shrink) + scaled α-ball dual projection
            def pd_step(_, c):
                u, yx, yy = c
                div = _dplus_T(yx, -2, masks) + _dplus_T(yy, -1, masks)
                w = (u - tau * div) - f
                u_new = f + jnp.where(
                    jnp.abs(w) <= 1.0 / gamma_d + tau,
                    w / (1.0 + tau * gamma_d),
                    w - tau * jnp.sign(w))
                ubar = 2.0 * u_new - u
                qx = scale * (yx + sigma * _dplus(ubar, -2, masks))
                qy = scale * (yy + sigma * _dplus(ubar, -1, masks))
                n = jnp.sqrt(qx * qx + qy * qy)
                s = jnp.where(n <= a, 1.0, a / jnp.maximum(n, tiny))
                return u_new, qx * s, qy * s

            u, yx, yy = lax.fori_loop(0, n_inner, pd_step, (u, yx, yy))

            # 2) smoothed adjoint system at u: TV-L2 γ_r-system
            #    (hypergrad.build_reg_system in plane form) with the
            #    identity data block swapped for the Huber data Hessian
            gx = _dplus(u, -2, masks)
            gy = _dplus(u, -1, masks)
            nGu = jnp.sqrt(gx * gx + gy * gy)
            act = (nGu > 1.0 / gamma_r).astype(dtype)
            inv_den = 1.0 / jnp.where(act > 0, nGu, 1.0)
            inv_den3 = inv_den * inv_den * inv_den
            d_hess = jnp.where(jnp.abs(u - f) <= 1.0 / gamma_d, gamma_d,
                               jnp.asarray(0.0, dtype))

            def H(q):
                qx_ = _dplus(q, -2, masks)
                qy_ = _dplus(q, -1, masks)
                dot3 = (gx * qx_ + gy * qy_) * inv_den3
                wx = a * (gamma_r * (1.0 - act) * qx_
                          + act * (qx_ * inv_den - gx * dot3))
                wy = a * (gamma_r * (1.0 - act) * qy_
                          + act * (qy_ * inv_den - gy * dot3))
                return (q + _dplus_T(wx, -2, masks)
                        + _dplus_T(wy, -1, masks) + (d_hess - 1.0) * q)

            wdx = a * (gamma_r * (1.0 - act)
                       + act * (inv_den - gx * gx * inv_den3))
            wdy = a * (gamma_r * (1.0 - act)
                       + act * (inv_den - gy * gy * inv_den3))
            diag = jnp.maximum(
                1.0 + _gram_axis(_STENCILS_FWD, wdx, -2, masks)
                + _gram_axis(_STENCILS_FWD, wdy, -1, masks)
                + (d_hess - 1.0), floor)

            # 3) n_adj Jacobi-CG steps, warm-started p (cg_batched algebra;
            #    rhs = ū − u so the chain-rule minus cancels: g = +⟨ψ, ∇p⟩)
            r = (utrue - u) - H(p)
            zc = r / diag
            d = zc
            rz = jnp.sum(r * zc)

            def cg_body(_, c):
                p, r, d, rz = c
                Hd = H(d)
                denom = jnp.sum(d * Hd)
                al = rz / jnp.where(denom == 0, 1.0, denom)
                p = p + al * d
                r = r - al * Hd
                zc = r / diag
                rz_new = jnp.sum(r * zc)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                d = zc + beta * d
                return p, r, d, rz_new

            p, _, _, _ = lax.fori_loop(0, n_adj, cg_body, (p, r, d, rz))

            # 4) hypergradient (field = (act/den + γ_r·inact)·Gu), clipped
            #    Adam on log α
            fx = (act * inv_den + gamma_r * (1.0 - act)) * gx
            fy = (act * inv_den + gamma_r * (1.0 - act)) * gy
            g = jnp.sum(_dplus(p, -2, masks) * fx
                        + _dplus(p, -1, masks) * fy)
            gz = jnp.clip(g * a, -clip, clip)
            t = (i + 1).astype(dtype)
            # Mosaic has no powf with a traced exponent
            b1t = jnp.exp(t * jnp.log(beta1))
            b2t = jnp.exp(t * jnp.log(beta2))
            m = beta1 * m + (1 - beta1) * gz
            v = beta2 * v + (1 - beta2) * gz * gz
            z = z - lr * (m / (1 - b1t)) / (jnp.sqrt(v / (1 - b2t)) + eps)

            traj_ref[i] = 0.5 * jnp.sum((u - utrue) ** 2)
            return (u, yx, yy, p, z, m, v)

        zeros = jnp.zeros_like(f)
        zero_s = jnp.zeros((), dtype)
        carry0 = (f, zeros, zeros, zeros, z_0, zero_s, zero_s)
        carry = lax.fori_loop(0, outer, outer_step, carry0)
        u_out[:] = carry[0]
        alpha_out[0] = jnp.exp(carry[4])

    return schedule_salt(tvl1_learner_kernel, key="ok_tvl1")


@functools.partial(
    jax.jit, static_argnames=("outer", "n_inner", "n_adj", "interpret"))
def _impl(utrue, f, x0, *, outer, n_inner, n_adj, lr, gamma_d, gamma_r,
          tau0, sigma0, beta1, beta2, eps, clip, interpret):
    dtype = f.dtype
    L = float(_TV.opnorm_sq()) ** 0.5
    scalars = jnp.concatenate([
        jnp.asarray([lr, gamma_d, gamma_r, tau0 / L, sigma0 / L, beta1,
                     beta2, eps, clip], dtype),
        jnp.log(jnp.asarray(x0, dtype))[None]])
    outs = pl.pallas_call(
        _kernel(int(outer), int(n_inner), int(n_adj)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct(f.shape, dtype),
                   jax.ShapeDtypeStruct((1,), dtype),
                   jax.ShapeDtypeStruct((int(outer),), dtype)),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(scalars, f, utrue)
    return outs[1][0], outs[0], outs[2]


def single_loop_tvl1_pallas(utrue, f, x0, *, outer: int = 300,
                            n_inner: int = 40, n_adj: int = 10,
                            lr: float = 0.05, gamma_d: float = 100.0,
                            gamma: float = 1000.0, tau0: float = 0.99,
                            sigma0: float = 0.99, beta1: float = 0.9,
                            beta2: float = 0.999, eps: float = 1e-8,
                            clip: float = 1.0, interpret: bool = False):
    """One-kernel single-loop TV-L1 learning on a single image.

    ``x0``: strictly positive scalar α.  ``f``/``utrue``: one (M, N)
    image (or a batch-1 (1, M, N) stack).  ``gamma_d``/``gamma``: data /
    regularizer Huber slopes (:mod:`..solvers.tvl1_huber` convention —
    defaults match ``tvl1_bilevel_params``).  Batched or patch problems
    use :func:`..bilevel.first_order_tvl1.single_loop_tvl1_learn` (the
    jnp scan — also one dispatch; this kernel's gain is VMEM residency of
    the full optimizer state across every step).

    Returns ``(alpha, u, cost_trajectory)``.
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 3
    if squeeze:
        if f.shape[0] != 1:
            raise ValueError(
                "single_loop_tvl1_pallas is single-image; use "
                "single_loop_tvl1_learn for batched problems")
        utrue, f = utrue[0], f[0]
    if f.ndim != 2:
        raise ValueError(f"expected one (M, N) image, got shape {f.shape}")
    x0 = jnp.asarray(x0, f.dtype)
    if x0.ndim != 0:
        raise ValueError("x0 must be a scalar; patch grids use "
                         "single_loop_tvl1_learn")
    _check_positive_x0(x0)
    peak = _PLANES * f.size * f.dtype.itemsize
    if peak > _VMEM_BUDGET:
        raise ValueError(
            f"image too large for the one-kernel TV-L1 learner "
            f"(~{peak >> 20} MiB of VMEM state); use "
            "single_loop_tvl1_learn (jnp scan)")
    alpha, u, traj = _impl(
        utrue, f, x0, outer=int(outer), n_inner=int(n_inner),
        n_adj=int(n_adj), lr=float(lr), gamma_d=float(gamma_d),
        gamma_r=float(gamma), tau0=float(tau0), sigma0=float(sigma0),
        beta1=float(beta1), beta2=float(beta2), eps=float(eps),
        clip=float(clip), interpret=bool(interpret))
    return alpha, (u[None] if squeeze else u), traj
