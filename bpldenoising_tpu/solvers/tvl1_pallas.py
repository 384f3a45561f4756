"""Fused Pallas TPU kernel for TV-L1 denoising.

Same design as :mod:`.pdps_pallas` (whole solver state VMEM-resident
across all iterations, roll+mask stencils imported from that module —
imported, not copied: its source lines are pinned by the executable
cache — grid over batch chunks) for the UNACCELERATED TV-L1 iteration of
:mod:`.tvl1`:

    u⁺ = f + shrink(u − τ∇ᵀy − f, τ);  ū = 2u⁺ − u;
    y⁺ = Π_{|·|₂ ≤ α}(y + σ∇ū)

The L1 prox is two extra elementwise ops over the quadratic prox
(sign·max shrinkage vs one scaled add), so the kernel inherits the PDPS
kernel's elementwise-roofline characteristics.  Routing: batch-chunked
VMEM kernel → whole-image residency → jnp/HBM path (the grayscale tiled
trapezoid rung is not instantiated here; beyond-VMEM TV-L1 solves take
the jnp path — same honesty rule as the measured-rejected VTV tiled
rung, revisit only with a win measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import tv_model
from .pdps_pallas import (_RESIDENT_BUDGET, _VMEM_BUDGET, _VMEM_LIMIT,
                          _dplus, _dplus_T, make_masks, schedule_salt)

__all__ = ["tvl1_denoise_pallas"]

_TV = tv_model()


def _tvl1_body(f, alpha, tau, sigma, masks):
    """One unaccelerated TV-L1 iteration over the carry (u, px, py)."""
    dtype = f.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def body(_, carry):
        u, px, py = carry
        div = _dplus_T(px, -2, masks) + _dplus_T(py, -1, masks)
        z = u - tau * div - f
        u_new = f + jnp.sign(z) * jnp.maximum(jnp.abs(z) - tau, 0.0)
        ubar = 2.0 * u_new - u
        qx = px + sigma * _dplus(ubar, -2, masks)
        qy = py + sigma * _dplus(ubar, -1, masks)
        n2 = qx * qx + qy * qy
        scale = jnp.where(n2 <= alpha * alpha, 1.0,
                          alpha * lax.rsqrt(n2 + tiny))
        return (u_new, qx * scale, qy * scale)

    return body


def _make_tvl1_kernel(maxiter: int, tau: float, sigma: float,
                      alpha_is_map: bool, tol, check_every: int,
                      warm: bool, return_state: bool):
    def tvl1_kernel(*refs):
        f_ref = refs[0]
        alpha_ref = refs[1]
        pos = 2
        if warm:
            u0_ref, px0_ref, py0_ref = refs[pos:pos + 3]
            pos += 3
        out_ref = refs[pos]
        state_out = refs[pos + 1:pos + 3] if return_state else ()

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
        body = _tvl1_body(f, alpha, jnp.asarray(tau, dtype),
                          jnp.asarray(sigma, dtype), masks)
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
        if return_state:
            state_out[0][:] = px
            state_out[1][:] = py

    return schedule_salt(tvl1_kernel, key="tvl1")


def _chunk_images(O: int, M: int, N: int, itemsize: int,
                  alpha_is_map: bool, extra_planes: int,
                  budget: int) -> int:
    """Images per grid step within a VMEM budget (8 live planes: u, f,
    div/z temps, px, py + projection temps)."""
    planes = 8 + extra_planes
    shared = (2 * M * N * itemsize) if alpha_is_map else 0
    return min(O, max(budget - shared, 0) // (planes * M * N * itemsize))


@functools.partial(
    jax.jit,
    static_argnames=("maxiter", "interpret", "tau0", "sigma0", "tol",
                     "check_every", "return_state"))
def _tvl1_pallas_impl(f, alpha, state0=None, *, tau0, sigma0, maxiter,
                      interpret, tol=None, check_every=500,
                      return_state=False):
    O, M, N = f.shape
    dtype = f.dtype
    L = float(_TV.opnorm_sq()) ** 0.5
    tau = float(tau0) / L
    sigma = float(sigma0) / L
    warm = state0 is not None
    alpha_is_map = alpha.ndim >= 2

    extra = (1 if tol is not None else 0) + (3 if warm else 0) \
        + (2 if return_state else 0)
    chunk = _chunk_images(O, M, N, dtype.itemsize, alpha_is_map, extra,
                          _VMEM_BUDGET)
    if chunk < 1:
        chunk = min(1, _chunk_images(O, M, N, dtype.itemsize,
                                     alpha_is_map, extra,
                                     _RESIDENT_BUDGET))
    if chunk < 1:
        # beyond-VMEM: HBM-resident jnp path (module docstring); convert
        # between this module's (u, px, py) state and the jnp path's
        # (u, y-stacked) format
        from .tvl1 import _tvl1_impl
        s0 = None
        if state0 is not None:
            s0 = (state0[0], jnp.stack([state0[1], state0[2]], axis=-3))
        out = _tvl1_impl(f, alpha, s0, tau=tau, sigma=sigma,
                         maxiter=maxiter, tol=tol,
                         check_every=check_every,
                         return_dual=return_state)
        if return_state:
            u, (u_, y), iters = out
            return u, (u_, y[..., 0, :, :], y[..., 1, :, :]), iters
        return out

    grid = (O + chunk - 1) // chunk
    O_pad = grid * chunk

    def pad(x):
        return (jnp.pad(x, ((0, O_pad - O), (0, 0), (0, 0)))
                if O_pad != O else x)

    f = pad(f)
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
        state_args = [pad(s) for s in state0]
        in_specs.extend([spec] * 3)

    kernel = _make_tvl1_kernel(int(maxiter), tau, sigma, alpha_is_map,
                               None if tol is None else float(tol),
                               int(check_every), warm, bool(return_state))

    n_out = 3 if return_state else 1
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((O_pad, M, N), dtype)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=40 * M * N * int(maxiter) * O_pad,
            bytes_accessed=4 * O_pad * M * N * dtype.itemsize,
            transcendentals=0),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(f, alpha_arg, *state_args)
    if return_state:
        u, px, py = (o[:O] for o in outs)
        return u, (u, px, py), jnp.asarray(maxiter)
    return outs[0][:O]


def tvl1_denoise_pallas(f, alpha, *, tau0=0.99, sigma0=0.99,
                        maxiter=5000, tol=None, check_every=500,
                        state0=None, return_dual=False,
                        interpret=False):
    """Fused-kernel TV-L1 denoising of (O, M, N) / (M, N) stacks (oracle:
    :func:`.tvl1.tvl1_denoise` — same iteration, same surface; with
    ``return_dual`` the returned iteration count is the static budget,
    unlike the jnp path's early-stop count)."""
    f = jnp.asarray(f)
    squeeze = f.ndim == 2
    if squeeze:
        f = f[None]
    if f.ndim != 3:
        raise ValueError(f"expected (M, N) or (O, M, N), got {f.shape}")
    alpha = jnp.asarray(alpha, f.dtype)
    if state0 is not None:
        if len(state0) == 3:              # this module's (u, px, py)
            u0, px, py = state0
        else:                             # jnp-path (u, y-stacked)
            u0, y = state0
            px, py = y[..., 0, :, :], y[..., 1, :, :]
        state0 = tuple(jnp.asarray(s, f.dtype) for s in (u0, px, py))
        if squeeze:
            state0 = tuple(s[None] if s.ndim == 2 else s for s in state0)
    out = _tvl1_pallas_impl(f, alpha, state0, tau0=float(tau0),
                            sigma0=float(sigma0), maxiter=int(maxiter),
                            interpret=bool(interpret),
                            tol=None if tol is None else float(tol),
                            check_every=int(check_every),
                            return_state=bool(return_dual))
    if return_dual:
        u, state, iters = out
        return (u[0] if squeeze else u), state, iters
    return out[0] if squeeze else out
