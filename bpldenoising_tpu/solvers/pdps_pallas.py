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
                 alpha_is_map: tuple[bool, ...], tol, check_every: int,
                 warm: bool, return_state: bool):
    """Kernel factory.

    ``tol`` enables in-kernel chunked early stopping: a ``while_loop`` over
    ``check_every``-iteration chunks, stopping when the relative change of
    ``u`` over a chunk falls below ``tol`` (same criterion as the jnp path's
    host-free chunked check in :func:`..pdps._denoise_pdps_impl`, evaluated
    per grid block rather than over the whole batch).  ``warm`` reads the
    initial (u, ys) state from extra VMEM inputs instead of the cold start
    (u₀ = f, y₀ = 0); ``return_state`` writes the final duals alongside
    ``u`` so callers can chain solves (warm-started trust-region
    evaluations).
    """
    K = model.K

    def kernel(*refs):
        f_ref = refs[0]
        alpha_refs = refs[1:1 + K]
        pos = 1 + K
        if warm:
            u0_ref = refs[pos]
            ys0_refs = refs[pos + 1:pos + 1 + 2 * K]
            pos += 1 + 2 * K
        out_ref = refs[pos]
        ys_out_refs = refs[pos + 1:pos + 1 + 2 * K] if return_state else ()

        f = f_ref[:]
        dtype = f.dtype
        alphas = []
        for k, is_map in enumerate(alpha_is_map):
            # SMEM scalars load elementwise; VMEM maps load whole-block
            alphas.append(alpha_refs[k][:] if is_map
                          else alpha_refs[k][0, 0])

        if warm:
            u0 = u0_ref[:]
            ys0 = tuple(r[:] for r in ys0_refs)
        else:
            u0 = f
            zeros = jnp.zeros_like(f)
            ys0 = tuple(zeros for _ in range(2 * K))
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

        carry0 = (u0, ys0, jnp.asarray(tau_init, dtype),
                  jnp.asarray(sigma_init, dtype))
        if tol is None:
            u_final, ys_final, _, _ = lax.fori_loop(0, maxiter, body, carry0)
        else:
            tol_ = jnp.asarray(tol, dtype)

            def chunk_cond(c):
                _, _, _, _, it, delta = c
                return jnp.logical_and(it < maxiter, delta > tol_)

            def chunk_body(c):
                u, ys, tau, sigma, it, _ = c
                u_prev = u
                n = jnp.minimum(check_every, maxiter - it)
                u, ys, tau, sigma = lax.fori_loop(
                    0, n, body, (u, ys, tau, sigma))
                # block-global relative change ‖u−u_prev‖/‖u‖ over the whole
                # grid block.  (The jnp path maxes a per-image criterion;
                # per-image reductions here produce 1-D/size-1 vector
                # intermediates that crash Mosaic layout inference, and the
                # block-global form is within a factor √chunk of it — callers
                # pick tol with that margin.)  Full reductions to scalars
                # lower cleanly.
                num = jnp.sum((u - u_prev) ** 2)
                den = jnp.maximum(jnp.sum(u ** 2),
                                  jnp.asarray(1e-24, dtype))
                delta = jnp.sqrt(num / den)
                return (u, ys, tau, sigma, it + n, delta)

            u_final, ys_final, _, _, _, _ = lax.while_loop(
                chunk_cond, chunk_body,
                carry0 + (jnp.asarray(0, jnp.int32),
                          jnp.asarray(jnp.inf, dtype)))

        out_ref[:] = u_final
        for r, y in zip(ys_out_refs, ys_final):
            r[:] = y

    return kernel


_VMEM_BUDGET = 8 * 1024 * 1024  # leave headroom in ~16MB VMEM


def _vmem_chunk(O: int, M: int, N: int, K: int, itemsize: int,
                n_alpha_maps: int = 0, extra_planes: int = 0) -> int:
    """Batch-chunk size keeping kernel state within a VMEM budget.

    Returns 0 when even a single image's solver state exceeds the budget
    (≈ ≥640² float32 for K=1) — callers fall back to the jnp path, whose
    state is HBM-resident.  Spatial tiling of the kernel (halo exchange per
    iteration) is the eventual fix; see bpldenoising_tpu.parallel.halo for
    the multi-chip analogue.
    """
    # live planes per image: u, f, ubar, div, 2K duals (+2K temps);
    # spatially-varying α maps add 2 shared planes each (α and α², not
    # per-image, but budgeted conservatively against the same pool);
    # extra_planes covers early-stop (u_prev) and warm-start inputs
    planes = 4 + 4 * K + extra_planes
    shared = 2 * n_alpha_maps * M * N * itemsize
    chunk = max(_VMEM_BUDGET - shared, 0) // (planes * M * N * itemsize)
    return min(O, chunk)


@functools.partial(
    jax.jit,
    static_argnames=("model", "maxiter", "accel", "interpret", "tau0",
                     "sigma0", "gamma", "tol", "check_every", "return_state"))
def _pallas_impl(f, alphas, state0=None, *, model, tau0, sigma0, gamma,
                 maxiter, accel, interpret, tol=None, check_every=500,
                 return_state=False):
    O, M, N = f.shape
    dtype = f.dtype
    K = model.K
    L = float(model.opnorm_sq()) ** 0.5
    tau_init = float(tau0) / L
    sigma_init = float(sigma0) / L
    warm = state0 is not None

    alpha_is_map = tuple(a.ndim >= 2 for a in alphas)
    extra = (1 if tol is not None else 0) + ((1 + 2 * K) if warm else 0)
    chunk = _vmem_chunk(O, M, N, K, dtype.itemsize,
                        n_alpha_maps=sum(alpha_is_map), extra_planes=extra)
    if chunk < 1:
        # image too large for VMEM-resident state — jnp/HBM path instead
        from .pdps import _denoise_pdps_impl
        out = _denoise_pdps_impl(
            f, alphas, state0, model=model, tau0=tau0, sigma0=sigma0,
            gamma=gamma, maxiter=maxiter, accel=accel, tol=tol,
            check_every=check_every, return_dual=return_state)
        if return_state:
            u, ys, _ = out
            return u, (u, ys)
        return out
    grid = (O + chunk - 1) // chunk

    # pad O to a multiple of the chunk
    O_pad = grid * chunk

    def pad(x):
        return (jnp.pad(x, ((0, O_pad - O), (0, 0), (0, 0)))
                if O_pad != O else x)

    f = pad(f)

    batch_spec = pl.BlockSpec((chunk, M, N), lambda o: (o, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [batch_spec]
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

    state_args = []
    if warm:
        u0, ys0 = state0
        assert len(ys0) == K, f"warm state needs K={K} dual fields"
        state_args.append(pad(u0))
        in_specs.append(batch_spec)
        for y in ys0:
            # (O, 2, M, N) per-op dual field → two (O, M, N) kernel planes
            state_args.append(pad(y[..., 0, :, :]))
            state_args.append(pad(y[..., 1, :, :]))
            in_specs.extend((batch_spec, batch_spec))

    kernel = _make_kernel(model, int(maxiter), bool(accel), float(gamma),
                          tau_init, sigma_init, alpha_is_map,
                          None if tol is None else float(tol),
                          int(check_every), warm, bool(return_state))

    n_out = 1 + (2 * K if return_state else 0)
    out_shape = [jax.ShapeDtypeStruct((O_pad, M, N), dtype)] * n_out
    out_specs = [batch_spec] * n_out

    flops_per_iter = (20 + 30 * K) * M * N  # stencils + prox, rough
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * int(maxiter) * O_pad,
            bytes_accessed=(2 + K) * O_pad * M * N * dtype.itemsize,
            transcendentals=int(maxiter)),
        interpret=bool(interpret),
    )(f, *alpha_args, *state_args)
    u = outs[0][:O]
    if return_state:
        ys = tuple(jnp.stack([outs[1 + 2 * k][:O], outs[2 + 2 * k][:O]],
                             axis=-3)
                   for k in range(K))
        return u, (u, ys)
    return u


def denoise_pdps_pallas(f, alphas, model: DenoiseModel, *, tau0=5.0,
                        sigma0=0.99 / 5.0, gamma=1.0, maxiter=5000,
                        accel=True, tol=None, check_every=500, state0=None,
                        return_state=False, interpret=False):
    """Drop-in fused-kernel replacement for
    :func:`bpldenoising_tpu.solvers.pdps.denoise_pdps`.

    Beyond the jnp path's surface this adds in-kernel chunked early stopping
    (``tol``/``check_every`` — the convergence check runs inside the kernel,
    VMEM-resident, no HBM round-trip) and solver-state chaining: pass
    ``state0=(u, ys)`` from a previous call's ``return_state=True`` output to
    warm-start (trust-region evaluations at nearby α converge in a few
    hundred iterations instead of the cold 5000).
    """
    f = jnp.asarray(f)
    squeeze = f.ndim == 2
    if squeeze:
        f = f[None]
    alphas = tuple(jnp.asarray(a, f.dtype)
                   for a in model.canonical_alphas(alphas))
    out = _pallas_impl(f, alphas, state0, model=model,
                       tau0=tau0, sigma0=sigma0, gamma=gamma,
                       maxiter=int(maxiter), accel=bool(accel),
                       tol=None if tol is None else float(tol),
                       check_every=int(check_every),
                       return_state=bool(return_state),
                       interpret=bool(interpret))
    if return_state:
        u, state = out
        return (u[0] if squeeze else u), state
    return out[0] if squeeze else out
