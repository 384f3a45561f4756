"""Fused Pallas TPU kernel for the accelerated PDPS inner solve.

The entire Chambolle–Pock iteration (SURVEY.md §7 step 7: "keep (u, p, ū)
VMEM-resident across iterations, fuse grad/prox/div per iteration; grid over
batch") runs inside one kernel: primal, duals and step sizes live in the
``fori_loop`` carry for all ``maxiter`` iterations, so per-iteration state
never round-trips HBM — the jnp path re-reads O(maxiter·(1+2K)·M·N) bytes
from HBM; this kernel reads each image once and writes it once.

Stencils are expressed as ``pltpu.roll`` + ``broadcasted_iota`` boundary
masks (the roll form of :mod:`bpldenoising_tpu.ops.grad`'s slice/concat
stencils — circular shifts are native to the VPU lane/sublane layout).

The grid tiles the batch dimension in VMEM-sized chunks; the α map (when
spatially varying) is broadcast to every grid step.  Semantics match
:func:`bpldenoising_tpu.solvers.pdps.denoise_pdps` (same fixed point, same
τ₀/σ₀/γ acceleration) — that jnp path remains the oracle, and
``test_pdps_pallas.py`` asserts agreement in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import DenoiseModel
from ..ops.grad import BwdGradientOp, CenteredGradientOp, FwdGradientOp

__all__ = ["denoise_pdps_pallas"]


# ---------------------------------------------------------------------------
# Roll+mask stencils on (..., M, N) values inside the kernel
# ---------------------------------------------------------------------------

def _idx(shape, axis):
    dim = len(shape) + axis if axis < 0 else axis
    return lax.broadcasted_iota(jnp.int32, shape, dimension=dim)


def _roll(x, shift, axis):
    """jnp.roll semantics on top of pltpu.roll (which requires a
    non-negative shift and axis index)."""
    ax = axis % x.ndim
    n = x.shape[ax]
    return pltpu.roll(x, shift % n, ax)


def make_masks(shape):
    """Boundary masks per spatial axis, computed ONCE per kernel invocation
    and reused across all loop iterations (loop-invariant hoisting the
    Mosaic compiler is not guaranteed to do through ``fori_loop``)."""
    masks = {}
    for axis in (-2, -1):
        i = _idx(shape, axis)
        n = shape[axis]
        masks[(axis, "not_last")] = i < n - 1
        masks[(axis, "not_first")] = i >= 1
        masks[(axis, "interior")] = jnp.logical_and(i >= 1, i < n - 1)
    return masks


def _dplus(u, axis, m):
    return jnp.where(m[(axis, "not_last")], _roll(u, -1, axis) - u, 0.0)


def _dplus_T(p, axis, m):
    a = jnp.where(m[(axis, "not_first")], _roll(p, 1, axis), 0.0)
    b = jnp.where(m[(axis, "not_last")], p, 0.0)
    return a - b


def _dminus(u, axis, m):
    return jnp.where(m[(axis, "not_first")], u - _roll(u, 1, axis), 0.0)


def _dminus_T(p, axis, m):
    a = jnp.where(m[(axis, "not_first")], p, 0.0)
    b = jnp.where(m[(axis, "not_last")], _roll(p, -1, axis), 0.0)
    return a - b


def _dcent(u, axis, m):
    return jnp.where(
        m[(axis, "interior")],
        0.5 * (_roll(u, -1, axis) - _roll(u, 1, axis)), 0.0)


def _dcent_T(p, axis, m):
    q = jnp.where(m[(axis, "interior")], p, 0.0)
    a = jnp.where(m[(axis, "not_first")], _roll(q, 1, axis), 0.0)
    b = jnp.where(m[(axis, "not_last")], _roll(q, -1, axis), 0.0)
    return 0.5 * (a - b)


_STENCILS = {
    FwdGradientOp: (_dplus, _dplus_T),
    BwdGradientOp: (_dminus, _dminus_T),
    CenteredGradientOp: (_dcent, _dcent_T),
}


def _grad_pair(op, u, m):
    """op.apply as two planes (gx, gy) each shaped like u."""
    fwd, _ = _STENCILS[type(op)]
    return fwd(u, -2, m), fwd(u, -1, m)


def _div_pair(op, gx, gy, m):
    _, adj = _STENCILS[type(op)]
    return adj(gx, -2, m) + adj(gy, -1, m)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(model: DenoiseModel, maxiter: int, accel: bool,
                 gamma: float, tau_init: float, sigma_init: float,
                 alpha_is_map: tuple[bool, ...]):
    K = model.K

    def kernel(*refs):
        f_ref = refs[0]
        alpha_refs = refs[1:1 + K]
        out_ref = refs[1 + K]

        f = f_ref[:]
        dtype = f.dtype
        alphas = []
        for k, is_map in enumerate(alpha_is_map):
            # SMEM scalars load elementwise; VMEM maps load whole-block
            alphas.append(alpha_refs[k][:] if is_map
                          else alpha_refs[k][0, 0])

        u0 = f
        zeros = jnp.zeros_like(f)
        ys0 = tuple(zeros for _ in range(2 * K))
        carry0 = (u0, ys0, jnp.asarray(tau_init, dtype),
                  jnp.asarray(sigma_init, dtype))
        masks = make_masks(f.shape)  # loop-invariant boundary masks
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        r2s = [a * a for a in alphas]

        def body(_, carry):
            u, ys, tau, sigma = carry
            div = None
            for k, op in enumerate(model.ops):
                d = _div_pair(op, ys[2 * k], ys[2 * k + 1], masks)
                div = d if div is None else div + d
            u_new = (u - tau * (div - f)) / (1.0 + tau)
            if accel:
                omega = lax.rsqrt(1.0 + 2.0 * gamma * tau)
                tau = tau * omega
                sigma = sigma / omega
            else:
                omega = jnp.asarray(1.0, dtype)
            ubar = (1.0 + omega) * u_new - omega * u
            ys_new = []
            for k, op in enumerate(model.ops):
                gx, gy = _grad_pair(op, ubar, masks)
                px = ys[2 * k] + sigma * gx
                py = ys[2 * k + 1] + sigma * gy
                # projection via rsqrt on the squared norm (no sqrt+divide)
                n2 = px * px + py * py
                scale = jnp.where(n2 <= r2s[k], 1.0,
                                  alphas[k] * lax.rsqrt(n2 + tiny))
                ys_new.extend((px * scale, py * scale))
            return (u_new, tuple(ys_new), tau, sigma)

        u_final, _, _, _ = lax.fori_loop(0, maxiter, body, carry0)
        out_ref[:] = u_final

    return kernel


_VMEM_BUDGET = 8 * 1024 * 1024  # leave headroom in ~16MB VMEM


def _vmem_chunk(O: int, M: int, N: int, K: int, itemsize: int,
                n_alpha_maps: int = 0) -> int:
    """Batch-chunk size keeping kernel state within a VMEM budget.

    Returns 0 when even a single image's solver state exceeds the budget
    (≈ ≥640² float32 for K=1) — callers fall back to the jnp path, whose
    state is HBM-resident.  Spatial tiling of the kernel (halo exchange per
    iteration) is the eventual fix; see bpldenoising_tpu.parallel.halo for
    the multi-chip analogue.
    """
    # live planes per image: u, f, ubar, div, 2K duals (+2K temps);
    # spatially-varying α maps add 2 shared planes each (α and α², not
    # per-image, but budgeted conservatively against the same pool)
    planes = 4 + 4 * K
    shared = 2 * n_alpha_maps * M * N * itemsize
    chunk = max(_VMEM_BUDGET - shared, 0) // (planes * M * N * itemsize)
    return min(O, chunk)


@functools.partial(
    jax.jit,
    static_argnames=("model", "maxiter", "accel", "interpret", "tau0",
                     "sigma0", "gamma"))
def _pallas_impl(f, alphas, *, model, tau0, sigma0, gamma, maxiter, accel,
                 interpret):
    O, M, N = f.shape
    dtype = f.dtype
    K = model.K
    L = float(model.opnorm_sq()) ** 0.5
    tau_init = float(tau0) / L
    sigma_init = float(sigma0) / L

    alpha_is_map = tuple(a.ndim >= 2 for a in alphas)
    chunk = _vmem_chunk(O, M, N, K, dtype.itemsize,
                        n_alpha_maps=sum(alpha_is_map))
    if chunk < 1:
        # image too large for VMEM-resident state — jnp/HBM path instead
        from .pdps import _denoise_pdps_impl
        return _denoise_pdps_impl(
            f, alphas, model=model, tau0=tau0, sigma0=sigma0, gamma=gamma,
            maxiter=maxiter, accel=accel, tol=None, check_every=500,
            return_dual=False)
    grid = (O + chunk - 1) // chunk

    # pad O to a multiple of the chunk
    O_pad = grid * chunk
    if O_pad != O:
        f = jnp.pad(f, ((0, O_pad - O), (0, 0), (0, 0)))

    in_specs = [pl.BlockSpec((chunk, M, N), lambda o: (o, 0, 0),
                             memory_space=pltpu.VMEM)]
    alpha_args = []
    for a, is_map in zip(alphas, alpha_is_map):
        if is_map:
            in_specs.append(pl.BlockSpec((M, N), lambda o: (0, 0),
                                         memory_space=pltpu.VMEM))
            alpha_args.append(a.astype(dtype))
        else:
            in_specs.append(pl.BlockSpec((1, 1), lambda o: (0, 0),
                                         memory_space=pltpu.SMEM))
            alpha_args.append(jnp.reshape(a.astype(dtype), (1, 1)))

    kernel = _make_kernel(model, int(maxiter), bool(accel), float(gamma),
                          tau_init, sigma_init, alpha_is_map)

    flops_per_iter = (20 + 30 * K) * M * N  # stencils + prox, rough
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, M, N), lambda o: (o, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O_pad, M, N), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * int(maxiter) * O_pad,
            bytes_accessed=(2 + K) * O_pad * M * N * dtype.itemsize,
            transcendentals=int(maxiter)),
        interpret=bool(interpret),
    )(f, *alpha_args)
    return out[:O]


def denoise_pdps_pallas(f, alphas, model: DenoiseModel, *, tau0=5.0,
                        sigma0=0.99 / 5.0, gamma=1.0, maxiter=5000,
                        accel=True, interpret=False):
    """Drop-in fused-kernel replacement for
    :func:`bpldenoising_tpu.solvers.pdps.denoise_pdps` (no early-stop mode,
    no dual return — the jnp path covers those)."""
    f = jnp.asarray(f)
    squeeze = f.ndim == 2
    if squeeze:
        f = f[None]
    alphas = tuple(jnp.asarray(a, f.dtype)
                   for a in model.canonical_alphas(alphas))
    out = _pallas_impl(f, alphas, model=model, tau0=tau0, sigma0=sigma0,
                       gamma=gamma, maxiter=int(maxiter), accel=bool(accel),
                       interpret=bool(interpret))
    return out[0] if squeeze else out
