"""Fused Pallas TPU kernel for Huber-smoothed TV-L1 denoising.

The learnable-surrogate companion of :mod:`.tvl1_pallas` (which fuses the
plain, nonsmooth TV-L1 iteration): whole solver state VMEM-resident across
all iterations, roll+mask stencils imported from :mod:`.pdps_pallas`, grid
over batch chunks, for the Huber-smoothed primal–dual iteration of
:mod:`.tvl1_huber`:

    u⁺ = f + P_{τ,γ_d}(u − τ∇ᵀy − f);   ū = 2u⁺ − u;
    y⁺ = Π_{|·|₂ ≤ α}( s · (y + σ∇ū) ),   s = 1/(1 + σ/(α γ_r))

with P the Huber prox (interior scaling / exterior shrink,
:func:`.tvl1_huber._huber_prox`).  The smoothing adds two elementwise
selects over the plain TV-L1 kernel, so it inherits the same
elementwise-roofline characteristics.  This is the forward solver of the
fused TV-L1 trust region (:mod:`..bilevel.fused_tvl1`) and the one-kernel
single-loop learner's oracle.  Lives in its own module so the pinned
plain-TV-L1 trace path is untouched (the compilation-cache key is
call-site-sensitive; cf. :mod:`.vtv_pallas`'s precedent).

Routing: batch-chunked VMEM kernel → whole-image residency → jnp/HBM path
(:func:`.tvl1_huber._tvl1_huber_impl`) beyond VMEM — same honesty rule as
the plain kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pdps_pallas import (_RESIDENT_BUDGET, _VMEM_BUDGET, _VMEM_LIMIT,
                          _dplus, _dplus_T, make_masks, schedule_salt)
from .tvl1_pallas import _chunk_images

__all__ = ["tvl1_huber_denoise_pallas", "tvl1_huber_pallas_impl"]


def _huber_body(f, alpha, tau, sigma, gamma_d, gamma_r, masks):
    """One Huber-smoothed TV-L1 iteration over the carry (u, px, py)."""
    dtype = f.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    # dual Huber scaling (α = 0 pixels project to y = 0 anyway; the floor
    # only guards the division — same convention as the jnp path)
    a_safe = jnp.maximum(alpha, jnp.asarray(1e-12, dtype))
    scale = 1.0 / (1.0 + sigma / (a_safe * gamma_r))
    lo = 1.0 / gamma_d + tau          # Huber-prox interior half-width

    def body(_, carry):
        u, px, py = carry
        div = _dplus_T(px, -2, masks) + _dplus_T(py, -1, masks)
        z = u - tau * div - f
        u_new = f + jnp.where(jnp.abs(z) <= lo,
                              z / (1.0 + tau * gamma_d),
                              z - tau * jnp.sign(z))
        ubar = 2.0 * u_new - u
        qx = scale * (px + sigma * _dplus(ubar, -2, masks))
        qy = scale * (py + sigma * _dplus(ubar, -1, masks))
        n2 = qx * qx + qy * qy
        s = jnp.where(n2 <= alpha * alpha, 1.0,
                      alpha * lax.rsqrt(n2 + tiny))
        return (u_new, qx * s, qy * s)

    return body


def _make_huber_kernel(maxiter: int, tau: float, sigma: float,
                       gamma_d: float, gamma_r: float, alpha_is_map: bool,
                       tol, check_every: int, warm: bool):
    def tvl1_huber_kernel(*refs):
        f_ref = refs[0]
        alpha_ref = refs[1]
        pos = 2
        if warm:
            u0_ref, px0_ref, py0_ref = refs[pos:pos + 3]
            pos += 3
        out_ref, px_out, py_out = refs[pos:pos + 3]

        f = f_ref[:]
        dtype = f.dtype
        alpha = alpha_ref[:] if alpha_is_map else alpha_ref[0, 0]
        if warm:
            u0, px0, py0 = u0_ref[:], px0_ref[:], py0_ref[:]
        else:
            u0 = f
            px0 = jnp.zeros_like(f)
            py0 = jnp.zeros_like(f)
        masks = make_masks(f.shape)
        body = _huber_body(f, alpha, jnp.asarray(tau, dtype),
                           jnp.asarray(sigma, dtype),
                           jnp.asarray(gamma_d, dtype),
                           jnp.asarray(gamma_r, dtype), masks)
        carry0 = (u0, px0, py0)
        if tol is None:
            u, px, py = lax.fori_loop(0, maxiter, body, carry0)
        else:
            tol_ = jnp.asarray(tol, dtype)

            def cond(c):
                _, _, _, it, delta = c
                return jnp.logical_and(it < maxiter, delta > tol_)

            def chunk(c):
                u, px, py, it, _ = c
                u_prev = u
                n = jnp.minimum(check_every, maxiter - it)
                u, px, py = lax.fori_loop(0, n, body, (u, px, py))
                num = jnp.sum((u - u_prev) ** 2)
                den = jnp.maximum(jnp.sum(u ** 2),
                                  jnp.asarray(1e-24, dtype))
                return (u, px, py, it + n, jnp.sqrt(num / den))

            u, px, py, _, _ = lax.while_loop(
                cond, chunk, carry0 + (jnp.asarray(0, jnp.int32),
                                       jnp.asarray(jnp.inf, dtype)))
        out_ref[:] = u
        px_out[:] = px
        py_out[:] = py

    return schedule_salt(tvl1_huber_kernel, key="tvl1h")


@functools.partial(
    jax.jit,
    static_argnames=("gamma_d", "gamma_r", "tau", "sigma", "maxiter",
                     "interpret", "tol", "check_every"))
def tvl1_huber_pallas_impl(f, alpha, state0=None, *, gamma_d, gamma_r,
                           tau, sigma, maxiter, interpret, tol=None,
                           check_every=500):
    """Fused-kernel Huber-smoothed TV-L1 solve of an (O, M, N) stack.

    Always returns ``(u, (u, px, py))`` — the state the fused trust region
    chains across evaluations.  ``state0`` accepts this module's
    ``(u, px, py)`` or the jnp path's ``(u, y-stacked)`` format.
    """
    O, M, N = f.shape
    dtype = f.dtype
    if state0 is not None and len(state0) == 2:       # jnp (u, y) format
        u0, y = state0
        state0 = (u0, y[..., 0, :, :], y[..., 1, :, :])
    warm = state0 is not None
    alpha_is_map = alpha.ndim >= 2

    extra = (1 if tol is not None else 0) + (3 if warm else 0) + 2
    chunk = _chunk_images(O, M, N, dtype.itemsize, alpha_is_map, extra,
                          _VMEM_BUDGET)
    if chunk < 1:
        chunk = min(1, _chunk_images(O, M, N, dtype.itemsize,
                                     alpha_is_map, extra,
                                     _RESIDENT_BUDGET))
    if chunk < 1:
        # beyond-VMEM: HBM-resident jnp path (module docstring)
        from .tvl1_huber import _tvl1_huber_impl
        s0 = None
        if state0 is not None:
            s0 = (state0[0], jnp.stack([state0[1], state0[2]], axis=-3))
        u, (u_, y) = _tvl1_huber_impl(
            f, alpha, s0, gamma_d=gamma_d, gamma_r=gamma_r, tau=tau,
            sigma=sigma, maxiter=maxiter, tol=tol,
            check_every=check_every, return_dual=True)
        return u, (u_, y[..., 0, :, :], y[..., 1, :, :])

    grid = (O + chunk - 1) // chunk
    O_pad = grid * chunk

    def pad(x):
        return (jnp.pad(x, ((0, O_pad - O), (0, 0), (0, 0)))
                if O_pad != O else x)

    f_p = pad(f)
    spec = pl.BlockSpec((chunk, M, N), lambda o: (o, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec]
    if alpha_is_map:
        in_specs.append(pl.BlockSpec((M, N), lambda o: (0, 0),
                                     memory_space=pltpu.VMEM))
        alpha_arg = alpha.astype(dtype)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda o: (0, 0),
                                     memory_space=pltpu.SMEM))
        alpha_arg = jnp.reshape(alpha.astype(dtype), (1, 1))

    state_args = []
    if warm:
        state_args = [pad(jnp.asarray(s, dtype)) for s in state0]
        in_specs.extend([spec] * 3)

    kernel = _make_huber_kernel(
        int(maxiter), float(tau), float(sigma), float(gamma_d),
        float(gamma_r), alpha_is_map, None if tol is None else float(tol),
        int(check_every), warm)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((O_pad, M, N), dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=44 * M * N * int(maxiter) * O_pad,
            bytes_accessed=4 * O_pad * M * N * dtype.itemsize,
            transcendentals=0),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(f_p, alpha_arg, *state_args)
    u, px, py = (o[:O] for o in outs)
    return u, (u, px, py)


def tvl1_huber_denoise_pallas(f, alpha, *, gamma_d: float = 100.0,
                              gamma_r: float = 1000.0, tau0: float = 0.99,
                              sigma0: float = 0.99, maxiter: int = 5000,
                              tol=None, check_every: int = 500,
                              state0=None, return_dual: bool = False,
                              interpret: bool = False):
    """Fused-kernel Huber-smoothed TV-L1 denoising of (O, M, N) / (M, N)
    stacks (oracle: :func:`.tvl1_huber.tvl1_huber_denoise` — same
    iteration, same surface)."""
    from ..models import tv_model
    f = jnp.asarray(f)
    squeeze = f.ndim == 2
    if squeeze:
        f = f[None]
    if f.ndim != 3:
        raise ValueError(f"expected (M, N) or (O, M, N), got {f.shape}")
    alpha = jnp.asarray(alpha, f.dtype)
    L = float(tv_model().opnorm_sq()) ** 0.5
    if state0 is not None:
        state0 = tuple(jnp.asarray(s, f.dtype) for s in state0)
        if squeeze:
            # per-image state arrays gain the batch axis the input gained
            state0 = tuple(s[None] for s in state0)
    u, state = tvl1_huber_pallas_impl(
        f, alpha, state0, gamma_d=float(gamma_d), gamma_r=float(gamma_r),
        tau=float(tau0) / L, sigma=float(sigma0) / L, maxiter=int(maxiter),
        interpret=bool(interpret),
        tol=None if tol is None else float(tol),
        check_every=int(check_every))
    if return_dual:
        return (u[0] if squeeze else u), state
    return u[0] if squeeze else u
