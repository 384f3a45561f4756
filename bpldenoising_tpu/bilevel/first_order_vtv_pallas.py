"""Fully-fused Pallas kernel for single-loop vectorial-TV bilevel learning.

The VTV analogue of :mod:`.first_order_tgv_pallas`: the ENTIRE
optimization — every channel-coupled CP step, every Jacobi-CG step on the
γ-Huber smoothed coupled system, every Adam update on log α — runs inside
ONE kernel launch with all state (3C solver planes, C adjoint planes, 3C
CG workspace planes, parameter/moment scalars) VMEM-resident for the
whole run.  Nothing touches HBM between reading (f, ū) once and writing
the result.

Scope: SINGLE-image color problems with the scalar coupling weight.  For
one image the jnp scan's per-image CG inner products coincide with global
ones, so :func:`..bilevel.first_order_vtv.single_loop_vtv_learn` is an
EXACT oracle (``tests/test_first_order_vtv_pallas.py``); batched or patch
problems route to that scan (itself one dispatch).

The in-kernel smoothed-system pieces mirror
:func:`..solvers.vtv._dpsi_coupled` in plane (roll+mask) form: the
per-pixel Frobenius norm reduces over the channel block dim (a cross-plane
VPU add), one Huber scale s and mask shared by all 2C components, and the
rank-one Jacobian term ties all channels of a pixel together.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import vtv_model
from ..solvers.pdps_pallas import (_STENCILS_FWD, _VMEM_LIMIT, _dplus,
                                   _dplus_T, _gram_axis, make_masks,
                                   schedule_salt)
from .first_order import _check_positive_x0

__all__ = ["single_loop_vtv_pallas"]

_VTV = vtv_model()
# SMEM scalar layout: lr, gamma, tau, sigma, beta1, beta2, eps, z_0
_N_SCALARS = 8

# live (M, N) planes per channel: f, utrue, u, px, py, lam, CG r/z/d +
# H-apply temps and ψ fields ≈ 15; plus the channel-shared norm/scale
# planes.  Mosaic's allocator measured ~2-2.6× the naive estimate on the
# TV learner kernel, so keep headroom.
_PLANES_PER_CHANNEL = 16
_VMEM_BUDGET = 36 * 1024 * 1024


def _kernel(outer: int, n_inner: int, n_adj: int):
    def vtv_learner_kernel(*refs):
        scalars_ref, f_ref, utrue_ref = refs[0], refs[1], refs[2]
        u_out, alpha_out, traj_ref = refs[3], refs[4], refs[5]

        f = f_ref[:]                      # (C, M, N)
        utrue = utrue_ref[:]
        dtype = f.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        masks = make_masks(f.shape)

        lr = scalars_ref[0]
        gamma = scalars_ref[1]
        tau = scalars_ref[2]
        sigma = scalars_ref[3]
        beta1 = scalars_ref[4]
        beta2 = scalars_ref[5]
        eps = scalars_ref[6]
        z_0 = scalars_ref[7]

        def vdot(ax, ay, az, bx, by, bz):
            # single image → the jnp path's per-image dot IS the global dot
            return jnp.sum(ax * bx) + jnp.sum(ay * by) + jnp.sum(az * bz)

        def outer_step(i, carry):
            u, px, py, lam, z, m, v = carry
            a = jnp.exp(z)

            # 1) n_inner fixed-step (unaccelerated) coupled-CP iterations
            #    — first_order_vtv's pd_step in plane form: one Frobenius
            #    scale per pixel shared by all 2C components
            def pd_step(_, c):
                u, px, py = c
                div = _dplus_T(px, -2, masks) + _dplus_T(py, -1, masks)
                u_new = (u - tau * (div - f)) / (1.0 + tau)
                ubar = 2.0 * u_new - u
                qx = px + sigma * _dplus(ubar, -2, masks)
                qy = py + sigma * _dplus(ubar, -1, masks)
                n = jnp.sqrt(jnp.sum(qx * qx + qy * qy, axis=-3,
                                     keepdims=True))
                scale = jnp.where(n <= a, 1.0, a / jnp.maximum(n, tiny))
                return u_new, qx * scale, qy * scale

            u, px, py = lax.fori_loop(0, n_inner, pd_step, (u, px, py))

            # 2) γ-Huber smoothed coupled system at u —
            #    solvers.vtv._dpsi_coupled in plane form
            gx = _dplus(u, -2, masks)
            gy = _dplus(u, -1, masks)
            nrm = jnp.sqrt(jnp.sum(gx * gx + gy * gy, axis=-3))   # (M, N)
            s = 1.0 / jnp.maximum(nrm, gamma)
            mk = (nrm >= gamma).astype(dtype)
            a_s = a * s

            def H(d):
                dx = _dplus(d, -2, masks)
                dy = _dplus(d, -1, masks)
                # rank-one coupling: (g·d)_F reduced over channel+component
                rad = (mk * jnp.sum(gx * dx + gy * dy, axis=-3)
                       * s * s * s)
                hx = a * (s * dx - gx * rad)
                hy = a * (s * dy - gy * rad)
                return d + _dplus_T(hx, -2, masks) + _dplus_T(hy, -1, masks)

            # Jacobi diagonal: channel-shared (s is per-pixel), as the jnp
            # path's gram_diag(stack([a_s, a_s]))
            diag = (1.0 + _gram_axis(_STENCILS_FWD, a_s, -2, masks)
                    + _gram_axis(_STENCILS_FWD, a_s, -1, masks))

            # 3) n_adj Jacobi-CG steps, warm-started λ (cg_batched algebra;
            #    rhs = ū − u so the chain-rule minus cancels: g = +⟨ψ, ∇λ⟩)
            r = (utrue - u) - H(lam)
            zc = r / diag
            d = zc
            rz = jnp.sum(r * zc)

            def cg_body(_, c):
                lam, r, d, rz = c
                Hd = H(d)
                denom = jnp.sum(d * Hd)
                al = rz / jnp.where(denom == 0, 1.0, denom)
                lam = lam + al * d
                r = r - al * Hd
                zc = r / diag
                rz_new = jnp.sum(r * zc)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                d = zc + beta * d
                return lam, r, d, rz_new

            lam, _, _, _ = lax.fori_loop(0, n_adj, cg_body, (lam, r, d, rz))

            # 4) hypergradient + Adam on log α
            lx = _dplus(lam, -2, masks)
            ly = _dplus(lam, -1, masks)
            g = jnp.sum(s * jnp.sum(gx * lx + gy * ly, axis=-3))
            gz = g * a
            t = (i + 1).astype(dtype)
            # Mosaic has no powf with a traced exponent
            b1t = jnp.exp(t * jnp.log(beta1))
            b2t = jnp.exp(t * jnp.log(beta2))
            m = beta1 * m + (1 - beta1) * gz
            v = beta2 * v + (1 - beta2) * gz * gz
            z = z - lr * (m / (1 - b1t)) / (jnp.sqrt(v / (1 - b2t)) + eps)

            traj_ref[i] = 0.5 * jnp.sum((u - utrue) ** 2)
            return (u, px, py, lam, z, m, v)

        zeros = jnp.zeros_like(f)
        zero_s = jnp.zeros((), dtype)
        carry0 = (f, zeros, zeros, zeros, z_0, zero_s, zero_s)
        carry = lax.fori_loop(0, outer, outer_step, carry0)
        u_out[:] = carry[0]
        alpha_out[0] = jnp.exp(carry[4])

    return schedule_salt(vtv_learner_kernel, key="ok_vtv")


@functools.partial(
    jax.jit, static_argnames=("outer", "n_inner", "n_adj", "interpret"))
def _impl(utrue, f, x0, *, outer, n_inner, n_adj, lr, gamma, tau0, sigma0,
          beta1, beta2, eps, interpret):
    dtype = f.dtype
    L = float(_VTV.opnorm_sq()) ** 0.5
    scalars = jnp.concatenate([
        jnp.asarray([lr, gamma, tau0 / L, sigma0 / L, beta1, beta2, eps],
                    dtype),
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


def single_loop_vtv_pallas(utrue, f, x0, *, outer: int = 300,
                           n_inner: int = 40, n_adj: int = 10,
                           lr: float = 0.05, gamma: float = 1e-4,
                           tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                           beta1: float = 0.9, beta2: float = 0.999,
                           eps: float = 1e-8, interpret: bool = False):
    """One-kernel single-loop vectorial-TV learning on a single color image.

    ``x0``: strictly positive scalar α.  ``f``/``utrue``: one (C, M, N)
    color image (or a batch-1 (1, C, M, N) stack).  Batched or patch
    problems use :func:`..bilevel.first_order_vtv.single_loop_vtv_learn`
    (the jnp scan — also one dispatch; this kernel's gain is VMEM
    residency of the full optimizer state across every step).

    Returns ``(alpha, u, cost_trajectory)``.
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 4
    if squeeze:
        if f.shape[0] != 1:
            raise ValueError(
                "single_loop_vtv_pallas is single-image; use "
                "single_loop_vtv_learn for batched problems")
        utrue, f = utrue[0], f[0]
    if f.ndim != 3:
        raise ValueError(f"expected one (C, M, N) color image, got shape "
                         f"{f.shape}")
    x0 = jnp.asarray(x0, f.dtype)
    if x0.ndim != 0:
        raise ValueError("x0 must be a scalar; patch grids use "
                         "single_loop_vtv_learn")
    _check_positive_x0(x0)
    peak = _PLANES_PER_CHANNEL * f.size * f.dtype.itemsize
    if peak > _VMEM_BUDGET:
        raise ValueError(
            f"image too large for the one-kernel VTV learner "
            f"(~{peak >> 20} MiB of VMEM state); use "
            "single_loop_vtv_learn (jnp scan)")
    alpha, u, traj = _impl(
        utrue, f, x0, outer=int(outer), n_inner=int(n_inner),
        n_adj=int(n_adj), lr=float(lr), gamma=float(gamma),
        tau0=float(tau0), sigma0=float(sigma0), beta1=float(beta1),
        beta2=float(beta2), eps=float(eps), interpret=bool(interpret))
    return alpha, (u[None] if squeeze else u), traj
