"""Fully-fused Pallas kernel for single-loop scalar-TV bilevel learning.

The entire optimization — every PD step, every adjoint CG step, every Adam
update on log α — runs inside ONE kernel launch with all state (primal,
dual, adjoint, CG workspace) VMEM-resident for the whole run.  Nothing
touches HBM between reading (f, ū) once and writing the result: the
logical conclusion of the fusion ladder (jnp per-op → fused pallas inner
solve → single-dispatch learning step → on-device scan → one kernel).

Mirrors :func:`bpldenoising_tpu.bilevel.first_order.single_loop_learn`
for the scalar-α TV model exactly (same update order, fixed-step CP, warm
CG, Adam in log space); that jnp path is the oracle
(``tests/test_first_order_pallas.py``) and remains the general-parameter
implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import tv_model
from ..solvers.pdps_pallas import _dplus, _dplus_T, make_masks

__all__ = ["single_loop_tv_pallas"]

_TV = tv_model()


def _kernel(outer: int, n_inner: int, n_adj: int):
    def kernel(scalars_ref, f_ref, utrue_ref, u_out, alpha_out, traj_ref):
        f = f_ref[:]
        utrue = utrue_ref[:]
        dtype = f.dtype
        masks = make_masks(f.shape)

        z0 = scalars_ref[0]
        lr = scalars_ref[1]
        gamma = scalars_ref[2]
        tau = scalars_ref[3]
        sigma = scalars_ref[4]
        beta1 = scalars_ref[5]
        beta2 = scalars_ref[6]
        eps = scalars_ref[7]
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

        def grad2(u):
            return _dplus(u, -2, masks), _dplus(u, -1, masks)

        def div2(yx, yy):
            return _dplus_T(yx, -2, masks) + _dplus_T(yy, -1, masks)

        def pd_step(alpha, carry):
            u, yx, yy = carry
            u_new = (u - tau * (div2(yx, yy) - f)) / (1.0 + tau)
            ubar = 2.0 * u_new - u
            gx, gy = grad2(ubar)
            qx = yx + sigma * gx
            qy = yy + sigma * gy
            n = jnp.sqrt(qx * qx + qy * qy)
            scale = jnp.where(n <= alpha, 1.0,
                              alpha / jnp.maximum(n, tiny))
            return u_new, qx * scale, qy * scale

        def reg_pieces(u, alpha):
            """Persistent planes across the CG loop are kept to the minimum
            (Gux, Guy, act, inv_den, inv_diag — VMEM peak is the binding
            constraint); inact = 1−act and den⁻³ are rederived inline."""
            Gux, Guy = grad2(u)
            nGu = jnp.sqrt(Gux * Gux + Guy * Guy)
            act = (nGu > 1.0 / gamma).astype(dtype)
            inv_den = 1.0 / jnp.where(act > 0, nGu, 1.0)

            def M_apply(p):
                Gpx, Gpy = grad2(p)
                dot3 = (Gux * Gpx + Guy * Gpy) * inv_den * inv_den * inv_den
                wx = alpha * (gamma * (1.0 - act) * Gpx
                              + act * (Gpx * inv_den - Gux * dot3))
                wy = alpha * (gamma * (1.0 - act) * Gpy
                              + act * (Gpy * inv_den - Guy * dot3))
                return p + div2(wx, wy)

            # Jacobi diagonal via the squared-weight stencil Gram sums
            inv_den3 = inv_den * inv_den * inv_den
            wdx = alpha * (gamma * (1.0 - act)
                           + act * (inv_den - Gux * Gux * inv_den3))
            wdy = alpha * (gamma * (1.0 - act)
                           + act * (inv_den - Guy * Guy * inv_den3))
            gram = _gram(wdx, -2, masks) + _gram(wdy, -1, masks)
            inv_diag = 1.0 / (1.0 + gram)
            return M_apply, inv_diag, Gux, Guy, act, inv_den

        def cg_steps(M_apply, inv_diag, b, p):
            r = b - M_apply(p)
            zv = inv_diag * r
            d = zv
            rz = jnp.sum(r * zv)

            def body(_, carry):
                p, r, zv, d, rz = carry
                Md = M_apply(d)
                denom = jnp.sum(d * Md)
                a = rz / jnp.where(denom == 0, 1.0, denom)
                p = p + a * d
                r = r - a * Md
                zv = inv_diag * r
                rz_new = jnp.sum(r * zv)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                d = zv + beta * d
                return (p, r, zv, d, rz_new)

            p, _, _, _, _ = lax.fori_loop(0, n_adj, body, (p, r, zv, d, rz))
            return p

        zeros = jnp.zeros_like(f)

        def outer_step(i, carry):
            u, yx, yy, p, z, m, v = carry
            alpha = jnp.exp(z)
            u, yx, yy = lax.fori_loop(
                0, n_inner, lambda k, c: pd_step(alpha, c), (u, yx, yy))
            M_apply, inv_diag, Gux, Guy, act, inv_den = reg_pieces(u, alpha)
            p = cg_steps(M_apply, inv_diag, utrue - u, p)
            Gpx, Gpy = grad2(p)
            wfield = act * inv_den + gamma * (1.0 - act)
            g_alpha = jnp.sum((Gpx * Gux + Gpy * Guy) * wfield)
            g_z = g_alpha * alpha
            t = (i + 1).astype(dtype)
            m = beta1 * m + (1 - beta1) * g_z
            v = beta2 * v + (1 - beta2) * g_z ** 2
            # Mosaic has no powf with a traced exponent; βᵗ = exp(t·log β)
            b1t = jnp.exp(t * jnp.log(beta1))
            b2t = jnp.exp(t * jnp.log(beta2))
            mhat = m / (1 - b1t)
            vhat = v / (1 - b2t)
            z_new = z - lr * mhat / (jnp.sqrt(vhat) + eps)
            traj_ref[i] = alpha           # α that produced this step's state
            return (u, yx, yy, p, z_new, m, v)

        carry0 = (f, zeros, zeros, zeros, z0,
                  jnp.zeros((), dtype), jnp.zeros((), dtype))
        u, yx, yy, p, z, m, v = lax.fori_loop(0, outer, outer_step, carry0)
        u_out[:] = u
        alpha_out[0] = jnp.exp(z)

    return kernel


def _gram(w, axis, masks):
    """diag(D⁺ᵀ diag(w) D⁺) with hoisted masks (squared ±1 weights)."""
    from ..solvers.pdps_pallas import _roll
    a = jnp.where(masks[(axis, "not_first")], _roll(w, 1, axis), 0.0)
    b = jnp.where(masks[(axis, "not_last")], w, 0.0)
    return a + b


@functools.partial(
    jax.jit,
    static_argnames=("outer", "n_inner", "n_adj", "interpret"))
def single_loop_tv_pallas(utrue, f, alpha0=0.1, *, outer: int = 300,
                          n_inner: int = 40, n_adj: int = 10,
                          lr: float = 0.05, gamma: float = 1e4,
                          tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                          beta1: float = 0.9, beta2: float = 0.999,
                          eps: float = 1e-8, interpret: bool = False):
    """One-kernel single-loop scalar-TV learning.

    Returns ``(alpha, u, alpha_trajectory)``.  The ~24 live state planes
    per image must fit VMEM — ≈10 images at 128² float32; larger problems
    raise and should use :func:`..first_order.single_loop_learn` (jnp scan).
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    dtype = f.dtype
    # peak live set ≈ 24 state planes (the batch-10 128² f32 flagship sits
    # right at the 16 MiB scoped-VMEM limit); clearly-too-large problems get
    # a friendly error instead of a Mosaic stack-OOM, marginal ones are left
    # to the compiler's exact accounting
    peak = 24 * f.size * dtype.itemsize
    if peak > 16 * 1024 * 1024:
        raise ValueError(
            f"problem too large for the one-kernel learner (~{peak>>20} MiB "
            "of VMEM state); use bilevel.single_loop_learn (jnp scan)")
    L = float(_TV.opnorm_sq()) ** 0.5
    scalars = jnp.asarray(
        [jnp.log(jnp.asarray(alpha0)), lr, gamma, tau0 / L, sigma0 / L,
         beta1, beta2, eps], dtype)

    u, alpha, traj = pl.pallas_call(
        _kernel(int(outer), int(n_inner), int(n_adj)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((int(outer),), dtype),
        ),
        interpret=bool(interpret),
    )(scalars, f, utrue)
    if squeeze:
        u = u[0]
    return alpha[0], u, traj
