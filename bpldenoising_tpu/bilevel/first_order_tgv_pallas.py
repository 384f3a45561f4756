"""Fully-fused Pallas kernel for single-loop TGV² bilevel learning.

The TGV analogue of :mod:`.first_order_pallas`: the ENTIRE optimization —
every joint-primal CP step, every Jacobi-CG step on the γ-Huber smoothed
joint system, every Adam update on log (α₁, α₀) — runs inside ONE kernel
launch with all state (8 solver planes, 3 adjoint planes, CG workspace,
parameter/moment scalars) VMEM-resident for the whole run.  Nothing
touches HBM between reading (f, ū) once and writing the result.

Scope: SINGLE-image problems (the reference's patch experiments are all
single-image) with the scalar weight pair.  For one image the jnp scan's
per-image CG inner products coincide with global ones, so
:func:`..bilevel.first_order_tgv.single_loop_tgv_learn` is an EXACT
oracle (``tests/test_first_order_tgv_pallas.py``); batched or patch
problems route to that scan (itself one dispatch).

The in-kernel smoothed-system pieces mirror
:func:`..solvers.tgv._build_joint_system` in plane (roll+mask) form:
ψ_γ fields and their Jacobian action for both Huber terms, the SPD
joint operator H, and the Jacobi diagonal built from the fwd/bwd stencil
gram diagonals.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.tgv import TGV_OPNORM_SQ
from ..solvers.pdps_pallas import (_STENCILS_BWD, _STENCILS_FWD, _dminus,
                                   _dminus_T, _dplus, _dplus_T, _gram_axis,
                                   _VMEM_LIMIT, make_masks, schedule_salt)
from ..solvers.tgv_pallas import _tgv_body
from .first_order import _check_positive_x0

__all__ = ["single_loop_tgv_pallas"]

_SQRT2 = math.sqrt(2.0)
# SMEM scalar layout: lr, gamma, tau, sigma, beta1, beta2, eps, z1_0, z0_0
_N_SCALARS = 9

# ~30 live (M, N) planes (2 inputs + 8 solver + 3 adjoint + 12 CG
# workspace + Huber pieces/temps); Mosaic's allocator measured ~2-2.6×
# the naive estimate on the TV learner kernel, so keep headroom
_PLANES = 34
_VMEM_BUDGET = 36 * 1024 * 1024


def _kernel(outer: int, n_inner: int, n_adj: int):
    def tgv_learner_kernel(*refs):
        scalars_ref, f_ref, utrue_ref = refs[0], refs[1], refs[2]
        u_out, alpha_out, traj_ref = refs[3], refs[4], refs[5]

        f = f_ref[:]
        utrue = utrue_ref[:]
        dtype = f.dtype
        masks = make_masks(f.shape)

        lr = scalars_ref[0]
        gamma = scalars_ref[1]
        tau = scalars_ref[2]
        sigma = scalars_ref[3]
        beta1 = scalars_ref[4]
        beta2 = scalars_ref[5]
        eps = scalars_ref[6]
        z1_0 = scalars_ref[7]
        z0_0 = scalars_ref[8]

        def vdot3(ax, ay, az, bx, by, bz):
            return (jnp.sum(ax * bx) + jnp.sum(ay * by)
                    + jnp.sum(az * bz))

        def outer_step(i, carry):
            (u, wr, wc, pr, pc, qrr, qcc, qrc, lu, lwr, lwc,
             z1, z0, m1, m0, v1, v0) = carry
            a1 = jnp.exp(z1)
            a0 = jnp.exp(z0)

            # 1) n_inner joint-CP iterations at the current weights
            body = _tgv_body(f, a1, a0, masks)
            step = functools.partial(body, tau, sigma)
            st = lax.fori_loop(0, n_inner, lambda k, s: step(s),
                               (u, wr, wc, pr, pc, qrr, qcc, qrc))
            u, wr, wc, pr, pc, qrr, qcc, qrc = st

            # 2) γ-Huber smoothed joint system at (u, w) —
            #    solvers.tgv._build_joint_system in plane form
            yx = _dplus(u, -2, masks) - wr
            yy = _dplus(u, -1, masks) - wc
            ny = jnp.sqrt(yx * yx + yy * yy)
            sy = 1.0 / jnp.maximum(ny, gamma)
            my = (ny >= gamma).astype(dtype)
            zrr = _dminus(wr, -2, masks)
            zcc = _dminus(wc, -1, masks)
            zrc = (_dminus(wr, -1, masks) + _dminus(wc, -2, masks)) / _SQRT2
            nz = jnp.sqrt(zrr * zrr + zcc * zcc + zrc * zrc)
            sz = 1.0 / jnp.maximum(nz, gamma)
            mz = (nz >= gamma).astype(dtype)

            def H(du, dwr, dwc):
                gx = _dplus(du, -2, masks) - dwr
                gy = _dplus(du, -1, masks) - dwc
                rad = my * (yx * gx + yy * gy) * sy * sy * sy
                hx = a1 * (sy * gx - yx * rad)
                hy = a1 * (sy * gy - yy * rad)
                err = _dminus(dwr, -2, masks)
                ecc = _dminus(dwc, -1, masks)
                erc = (_dminus(dwr, -1, masks)
                       + _dminus(dwc, -2, masks)) / _SQRT2
                radz = (mz * (zrr * err + zcc * ecc + zrc * erc)
                        * sz * sz * sz)
                hrr = a0 * (sz * err - zrr * radz)
                hcc = a0 * (sz * ecc - zcc * radz)
                hrc = a0 * (sz * erc - zrc * radz)
                Hu = du + _dplus_T(hx, -2, masks) + _dplus_T(hy, -1, masks)
                Hwr = (-hx + _dminus_T(hrr, -2, masks)
                       + _dminus_T(hrc, -1, masks) / _SQRT2)
                Hwc = (-hy + _dminus_T(hcc, -1, masks)
                       + _dminus_T(hrc, -2, masks) / _SQRT2)
                return Hu, Hwr, Hwc

            # Jacobi diagonal (isotropic approximation, as the jnp path)
            a1sy = a1 * sy
            a0sz = a0 * sz
            diag_u = (1.0 + _gram_axis(_STENCILS_FWD, a1sy, -2, masks)
                      + _gram_axis(_STENCILS_FWD, a1sy, -1, masks))
            gb_r = _gram_axis(_STENCILS_BWD, a0sz, -2, masks)
            gb_c = _gram_axis(_STENCILS_BWD, a0sz, -1, masks)
            diag_wr = a1sy + gb_r + 0.5 * gb_c
            diag_wc = a1sy + gb_c + 0.5 * gb_r

            # 3) n_adj Jacobi-CG steps, warm-started λ
            #    (rhs = (ū − u, 0, 0); gradient signs as in first_order_tgv)
            Hu, Hwr, Hwc = H(lu, lwr, lwc)
            ru = (utrue - u) - Hu
            rwr = -Hwr
            rwc = -Hwc
            zu, zwr, zwc = ru / diag_u, rwr / diag_wr, rwc / diag_wc
            du_, dwr_, dwc_ = zu, zwr, zwc
            rz = vdot3(ru, rwr, rwc, zu, zwr, zwc)

            def cg_body(_, c):
                lu, lwr, lwc, ru, rwr, rwc, du_, dwr_, dwc_, rz = c
                Hdu, Hdwr, Hdwc = H(du_, dwr_, dwc_)
                denom = vdot3(du_, dwr_, dwc_, Hdu, Hdwr, Hdwc)
                a = rz / jnp.where(denom == 0, 1.0, denom)
                lu = lu + a * du_
                lwr = lwr + a * dwr_
                lwc = lwc + a * dwc_
                ru = ru - a * Hdu
                rwr = rwr - a * Hdwr
                rwc = rwc - a * Hdwc
                zu, zwr, zwc = ru / diag_u, rwr / diag_wr, rwc / diag_wc
                rz_new = vdot3(ru, rwr, rwc, zu, zwr, zwc)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                du_ = zu + beta * du_
                dwr_ = zwr + beta * dwr_
                dwc_ = zwc + beta * dwc_
                return (lu, lwr, lwc, ru, rwr, rwc, du_, dwr_, dwc_,
                        rz_new)

            (lu, lwr, lwc, *_rest) = lax.fori_loop(
                0, n_adj, cg_body,
                (lu, lwr, lwc, ru, rwr, rwc, du_, dwr_, dwc_, rz))

            # 4) hypergradient + Adam on (log α₁, log α₀)
            glx = _dplus(lu, -2, masks) - lwr
            gly = _dplus(lu, -1, masks) - lwc
            g1 = jnp.sum(yx * sy * glx + yy * sy * gly)
            lerr = _dminus(lwr, -2, masks)
            lecc = _dminus(lwc, -1, masks)
            lerc = (_dminus(lwr, -1, masks)
                    + _dminus(lwc, -2, masks)) / _SQRT2
            g0 = jnp.sum(zrr * sz * lerr + zcc * sz * lecc
                         + zrc * sz * lerc)
            gz1 = g1 * a1
            gz0 = g0 * a0
            t = (i + 1).astype(dtype)
            # Mosaic has no powf with a traced exponent
            b1t = jnp.exp(t * jnp.log(beta1))
            b2t = jnp.exp(t * jnp.log(beta2))
            m1 = beta1 * m1 + (1 - beta1) * gz1
            v1 = beta2 * v1 + (1 - beta2) * gz1 * gz1
            m0 = beta1 * m0 + (1 - beta1) * gz0
            v0 = beta2 * v0 + (1 - beta2) * gz0 * gz0
            z1 = z1 - lr * (m1 / (1 - b1t)) / (
                jnp.sqrt(v1 / (1 - b2t)) + eps)
            z0 = z0 - lr * (m0 / (1 - b1t)) / (
                jnp.sqrt(v0 / (1 - b2t)) + eps)

            traj_ref[i] = 0.5 * jnp.sum((u - utrue) ** 2)
            return (u, wr, wc, pr, pc, qrr, qcc, qrc, lu, lwr, lwc,
                    z1, z0, m1, m0, v1, v0)

        zeros = jnp.zeros_like(f)
        zero_s = jnp.zeros((), dtype)
        carry0 = (f,) + (zeros,) * 10 + (z1_0, z0_0, zero_s, zero_s,
                                         zero_s, zero_s)
        carry = lax.fori_loop(0, outer, outer_step, carry0)
        u_out[:] = carry[0]
        alpha_out[0] = jnp.exp(carry[11])
        alpha_out[1] = jnp.exp(carry[12])

    return schedule_salt(tgv_learner_kernel, key="ok_tgv")


@functools.partial(
    jax.jit, static_argnames=("outer", "n_inner", "n_adj", "interpret"))
def _impl(utrue, f, x0, *, outer, n_inner, n_adj, lr, gamma, tau0, sigma0,
          beta1, beta2, eps, interpret):
    dtype = f.dtype
    L = TGV_OPNORM_SQ ** 0.5
    scalars = jnp.concatenate([
        jnp.asarray([lr, gamma, tau0 / L, sigma0 / L, beta1, beta2, eps],
                    dtype),
        jnp.log(jnp.asarray(x0, dtype))])
    outs = pl.pallas_call(
        _kernel(int(outer), int(n_inner), int(n_adj)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct(f.shape, dtype),
                   jax.ShapeDtypeStruct((2,), dtype),
                   jax.ShapeDtypeStruct((int(outer),), dtype)),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(scalars, f, utrue)
    return outs[1], outs[0], outs[2]


def single_loop_tgv_pallas(utrue, f, x0, *, outer: int = 300,
                           n_inner: int = 40, n_adj: int = 10,
                           lr: float = 0.02, gamma: float = 1e-4,
                           tau0: float = 0.99, sigma0: float = 0.99,
                           beta1: float = 0.9, beta2: float = 0.999,
                           eps: float = 1e-8, interpret: bool = False):
    """One-kernel single-loop TGV² learning on a single image.

    ``x0``: strictly positive ``[α₁, α₀]``.  ``f``/``utrue``: one (M, N)
    image (or a batch-1 (1, M, N) stack).  Batched or patch problems use
    :func:`..bilevel.first_order_tgv.single_loop_tgv_learn` (the jnp
    scan — also one dispatch; this kernel's gain is VMEM residency of
    the full optimizer state across every step).

    Returns ``(alpha, u, cost_trajectory)``.
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 3
    if squeeze:
        if f.shape[0] != 1:
            raise ValueError(
                "single_loop_tgv_pallas is single-image; use "
                "single_loop_tgv_learn for batched problems")
        utrue, f = utrue[0], f[0]
    if f.ndim != 2:
        raise ValueError(f"expected one (M, N) image, got shape {f.shape}")
    x0 = jnp.asarray(x0, f.dtype)
    if x0.shape != (2,):
        raise ValueError("x0 must be the [alpha1, alpha0] 2-vector; patch "
                         "grids use single_loop_tgv_learn")
    _check_positive_x0(x0)
    peak = _PLANES * f.size * f.dtype.itemsize
    if peak > _VMEM_BUDGET:
        raise ValueError(
            f"image too large for the one-kernel TGV learner "
            f"(~{peak >> 20} MiB of VMEM state); use "
            "single_loop_tgv_learn (jnp scan)")
    alpha, u, traj = _impl(
        utrue, f, x0, outer=int(outer), n_inner=int(n_inner),
        n_adj=int(n_adj), lr=float(lr), gamma=float(gamma),
        tau0=float(tau0), sigma0=float(sigma0), beta1=float(beta1),
        beta2=float(beta2), eps=float(eps), interpret=bool(interpret))
    return alpha, (u[None] if squeeze else u), traj
