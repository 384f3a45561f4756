"""Fused Pallas TPU kernel for vectorial (color) TV PDPS.

Same design as :mod:`.pdps_pallas` (whole solver state VMEM-resident across
all iterations, roll+mask stencils, grid over the batch) with ONE semantic
difference: the dual projection couples channels through the per-pixel
FROBENIUS ball — ``n² = Σ_c (p_x,c² + p_y,c²)`` reduced over the channel
axis, one scale shared by all 2C components of a pixel.

Blocks are 4-D ``(groups, C, M, N)``: the channel axis is an untiled
leading block dim, so the coupling reduction is a cheap cross-plane add in
VMEM and the stencils/masks are the shape-polymorphic helpers imported from
:mod:`.pdps_pallas` (imported, not copied — that module's source lines are
pinned by the executable cache and must not shift).

Routing: batch-chunked VMEM kernel → whole-image residency → jnp/HBM
path.  Unlike the grayscale ladder there is no tiled rung: it was built
and measured-rejected (see the routing comment in ``_vtv_pallas_impl``
and BASELINE.md "VTV tiled rung: rejected, measured").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import vtv_model
from .pdps_pallas import (_RESIDENT_BUDGET, _VMEM_BUDGET, _VMEM_LIMIT,
                          _dplus, _dplus_T, make_masks, schedule_salt)

__all__ = ["vtv_denoise_pdps_pallas"]

_VTV = vtv_model()


def _vtv_body(f, alpha, masks):
    """One accelerated-CP VTV iteration over the carry (u, px, py, τ, σ).

    All fields are (..., C, M, N); the projection reduces the squared norm
    over the channel axis (-3) and the two component planes.
    """
    dtype = f.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    r2 = alpha * alpha

    def body(_, carry):
        u, px, py, tau, sigma = carry
        div = _dplus_T(px, -2, masks) + _dplus_T(py, -1, masks)
        u_new = (u - tau * (div - f)) / (1.0 + tau)
        omega = lax.rsqrt(1.0 + 2.0 * tau)          # γ = 1 data term
        tau = tau * omega
        sigma = sigma / omega
        ubar = (1.0 + omega) * u_new - omega * u
        qx = px + sigma * _dplus(ubar, -2, masks)
        qy = py + sigma * _dplus(ubar, -1, masks)
        # channel-coupled Frobenius projection: one scale per PIXEL shared
        # by all 2C components (sum over the channel block dim is a
        # cross-plane VPU add, not a lane shuffle)
        n2 = jnp.sum(qx * qx + qy * qy, axis=-3, keepdims=True)
        scale = jnp.where(n2 <= r2, 1.0, alpha * lax.rsqrt(n2 + tiny))
        return (u_new, qx * scale, qy * scale, tau, sigma)

    return body


def _make_vtv_kernel(maxiter: int, tau_init: float, sigma_init: float,
                     alpha_is_map: bool, tol, check_every: int, warm: bool,
                     return_state: bool):
    def vtv_kernel(*refs):
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
        body = _vtv_body(f, alpha, masks)
        carry0 = (u0, px0, py0, jnp.asarray(tau_init, dtype),
                  jnp.asarray(sigma_init, dtype))
        if tol is None:
            u, px, py, _, _ = lax.fori_loop(0, maxiter, body, carry0)
        else:
            tol_ = jnp.asarray(tol, dtype)

            def cond(c):
                _, _, _, _, _, it, delta = c
                return jnp.logical_and(it < maxiter, delta > tol_)

            def chunk(c):
                u, px, py, tau, sigma, it, _ = c
                u_prev = u
                n = jnp.minimum(check_every, maxiter - it)
                u, px, py, tau, sigma = lax.fori_loop(
                    0, n, body, (u, px, py, tau, sigma))
                num = jnp.sum((u - u_prev) ** 2)
                den = jnp.maximum(jnp.sum(u ** 2),
                                  jnp.asarray(1e-24, dtype))
                delta = jnp.sqrt(num / den)
                return (u, px, py, tau, sigma, it + n, delta)

            u, px, py, _, _, _, _ = lax.while_loop(
                cond, chunk, carry0 + (jnp.asarray(0, jnp.int32),
                                       jnp.asarray(jnp.inf, dtype)))
        out_ref[:] = u
        if return_state:
            state_out[0][:] = px
            state_out[1][:] = py

    return schedule_salt(vtv_kernel, key="vtv")


def _chunk_groups(O: int, C: int, M: int, N: int, itemsize: int,
                  alpha_is_map: bool, extra_planes: int,
                  budget: int) -> int:
    """Image groups per grid step within a VMEM budget (8 live planes per
    channel: u, f, ubar, div, px, py + 2 projection temps)."""
    planes = (8 + extra_planes) * C
    shared = (2 * M * N * itemsize) if alpha_is_map else 0
    return min(O, max(budget - shared, 0) // (planes * M * N * itemsize))


@functools.partial(
    jax.jit,
    static_argnames=("maxiter", "interpret", "tau0", "sigma0", "tol",
                     "check_every", "return_state"))
def _vtv_pallas_impl(f, alpha, state0=None, *, tau0, sigma0, maxiter,
                     interpret, tol=None, check_every=500,
                     return_state=False):
    O, C, M, N = f.shape
    dtype = f.dtype
    L = float(_VTV.opnorm_sq()) ** 0.5
    tau_init = float(tau0) / L
    sigma_init = float(sigma0) / L
    warm = state0 is not None
    alpha_is_map = alpha.ndim >= 2

    extra = (1 if tol is not None else 0) + (3 if warm else 0) \
        + (2 if return_state else 0)
    chunk = _chunk_groups(O, C, M, N, dtype.itemsize, alpha_is_map, extra,
                          _VMEM_BUDGET)
    if chunk < 1:
        chunk = min(1, _chunk_groups(O, C, M, N, dtype.itemsize,
                                     alpha_is_map, extra,
                                     _RESIDENT_BUDGET))
    if chunk < 1:
        # beyond-VMEM color image: HBM-resident jnp path.  A spatially-
        # tiled color rung was built and MEASURED REJECTED (round 3): C×
        # the planes shrink the per-tile row budget to ~40-56 rows at
        # N=1024, so the 2H halo is 30-80% redundant compute — best
        # geometry (56 rows, T=4) ties jnp at 0.197 vs 0.194 s (1×1024²
        # RGB, 2000 iters, v5e) and no tile fits at 2048²; XLA's fused
        # HBM-streaming path is the right rung here (BASELINE.md "VTV
        # tiled rung: rejected, measured").
        from .pdps import _denoise_pdps_impl
        out = _denoise_pdps_impl(
            f, (alpha,), state0 if state0 is None else
            (state0[0], (jnp.stack(state0[1:], axis=-3),)),
            model=_VTV, tau0=tau0, sigma0=sigma0, gamma=1.0,
            maxiter=maxiter, accel=True, tol=tol, check_every=check_every,
            return_dual=return_state)
        if return_state:
            u, ys, _ = out
            y = ys[0]
            return u, (u, y[..., 0, :, :], y[..., 1, :, :])
        return out

    grid = (O + chunk - 1) // chunk
    O_pad = grid * chunk

    def pad(x):
        return (jnp.pad(x, ((0, O_pad - O),) + ((0, 0),) * 3)
                if O_pad != O else x)

    f = pad(f)
    spec = pl.BlockSpec((chunk, C, M, N), lambda o: (o, 0, 0, 0),
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

    kernel = _make_vtv_kernel(int(maxiter), tau_init, sigma_init,
                              alpha_is_map,
                              None if tol is None else float(tol),
                              int(check_every), warm, bool(return_state))

    n_out = 3 if return_state else 1
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((O_pad, C, M, N), dtype)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=55 * C * M * N * int(maxiter) * O_pad,
            bytes_accessed=4 * O_pad * C * M * N * dtype.itemsize,
            transcendentals=int(maxiter)),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(f, alpha_arg, *state_args)
    if return_state:
        u, px, py = (o[:O] for o in outs)
        return u, (u, px, py)
    return outs[0][:O]


def vtv_denoise_pdps_pallas(f, alpha, *, tau0=5.0, sigma0=0.99 / 5.0,
                            maxiter=5000, tol=None, check_every=500,
                            state0=None, return_state=False,
                            interpret=False):
    """Fused-kernel vectorial-TV denoising of ``(O, C, M, N)`` /
    ``(C, M, N)`` color stacks (oracle: :func:`..solvers.pdps.vtv_denoise`).

    ``state0``/``return_state`` chain the (u, px, py) solver state across
    calls — the same warm-start discipline as
    :func:`.pdps_pallas.denoise_pdps_pallas`.  ``state0`` also accepts the
    jnp path's ``(u, ys)`` format (a 1-tuple of (..., 2, M, N) duals).
    """
    f = jnp.asarray(f)
    squeeze = f.ndim == 3
    if squeeze:
        f = f[None]
    if f.ndim != 4:
        raise ValueError(f"expected (C, M, N) or (O, C, M, N), got {f.shape}")
    alpha = jnp.asarray(alpha, f.dtype)
    if state0 is not None:
        if len(state0) == 2:          # jnp-path (u, ys) format
            u0, ys = state0
            y = ys[0] if isinstance(ys, (tuple, list)) else ys
            state0 = (u0, y[..., 0, :, :], y[..., 1, :, :])
        state0 = tuple(jnp.asarray(s, f.dtype) for s in state0)
        if squeeze:
            state0 = tuple(s[None] if s.ndim == 3 else s for s in state0)
    out = _vtv_pallas_impl(f, alpha, state0, tau0=float(tau0),
                           sigma0=float(sigma0), maxiter=int(maxiter),
                           interpret=bool(interpret),
                           tol=None if tol is None else float(tol),
                           check_every=int(check_every),
                           return_state=bool(return_state))
    if return_state:
        u, state = out
        return (u[0] if squeeze else u), state
    return out[0] if squeeze else out
