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
import os

import jax
import jax.numpy as jnp
import numpy as np
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


def make_masks(shape, row_offset=None, n_rows_global=None):
    """Boundary masks per spatial axis, computed ONCE per kernel invocation
    and reused across all loop iterations (loop-invariant hoisting the
    Mosaic compiler is not guaranteed to do through ``fori_loop``).

    ``row_offset``/``n_rows_global``: for spatially-tiled kernels the row
    axis (-2) masks are evaluated at GLOBAL image coordinates
    ``iota + row_offset`` against the global row count — the true image
    boundary lands inside (or outside) the tile wherever it belongs, and
    the masked stencils sever any data flow across it, so halo padding
    garbage can never reach valid rows."""
    masks = {}
    for axis in (-2, -1):
        i = _idx(shape, axis)
        n = shape[axis]
        if axis == -2 and row_offset is not None:
            i = i + row_offset
            n = n_rows_global
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


# sentinels to dispatch _gram_axis on the stencil kind
_STENCILS_FWD, _STENCILS_BWD, _STENCILS_CENT = "fwd", "bwd", "cent"


def _gram_axis(kind, w, axis, masks):
    """diag(Gₐᵀ diag(w) Gₐ) for one derivative component Gₐ (weights are
    the squared stencil entries: 1 for fwd/bwd, ¼ for centered)."""
    if kind is _STENCILS_FWD:
        # (D⁺u)_i = u_{i+1} − u_i on i ≤ n−2: column j hit by rows j (not
        # last) and j−1 (exists for j ≥ 1)
        a = jnp.where(masks[(axis, "not_first")], _roll(w, 1, axis), 0.0)
        b = jnp.where(masks[(axis, "not_last")], w, 0.0)
        return a + b
    if kind is _STENCILS_BWD:
        # (D⁻u)_i = u_i − u_{i−1} on i ≥ 1: column j hit by rows j (j ≥ 1)
        # and j+1 (j ≤ n−2)
        a = jnp.where(masks[(axis, "not_first")], w, 0.0)
        b = jnp.where(masks[(axis, "not_last")], _roll(w, -1, axis), 0.0)
        return a + b
    # centered: (Dᶜu)_i = (u_{i+1} − u_{i−1})/2 on interior i: column j hit
    # by interior rows j−1 and j+1, squared weight ¼; boundary wrap terms
    # vanish because q is zero outside the interior
    q = jnp.where(masks[(axis, "interior")], w, 0.0)
    return 0.25 * (_roll(q, 1, axis) + _roll(q, -1, axis))


def _stencil_kind(op):
    from ..ops.grad import BwdGradientOp, CenteredGradientOp, FwdGradientOp
    return {FwdGradientOp: _STENCILS_FWD, BwdGradientOp: _STENCILS_BWD,
            CenteredGradientOp: _STENCILS_CENT}[type(op)]


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

def _pd_body(model: DenoiseModel, accel: bool, gamma: float, f, alphas,
             masks):
    """One accelerated-CP iteration as a fori_loop body over the carry
    (u, ys-planes, τ, σ); shared by the batch kernel and the tiled kernel."""
    dtype = f.dtype
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

    return body


def schedule_salt(kernel, key: str | None = None):
    """Apply the Mosaic schedule salt to a kernel function.

    Mosaic's AOT compiler binds a different (measured up to ~30%
    faster/slower on v5e) binary per serialized-module hash, and the kernel
    function's name is part of that hash; compiles of an UNCHANGED module
    are deterministic.  Renaming a kernel yields a fresh deterministic
    draw, so ``scripts/pin_schedule.py`` can sweep name variants, find a
    fast draw, and pin it via the persistent compilation cache for all
    future runs (BASELINE.md "Deterministic walltime").  Empty salt =
    no-op.

    ``key`` names the kernel family (``pdps_cold``, ``pdps_warm``, ``hg``,
    ``ok``, ...) so families living in DIFFERENT jitted modules can be
    pinned to different draws: one global salt cannot make the flagship
    fused-TR module (pdps_warm + hg) AND the standalone throughput module
    (pdps_cold) both land their fastest schedules, because their module
    hashes draw independently.  Resolution order:
    ``BPL_MOSAIC_SALT_<KEY>`` (uppercased) then ``BPL_MOSAIC_SALT``.
    """
    salt = ""
    if key:
        salt = os.environ.get(f"BPL_MOSAIC_SALT_{key.upper()}", "")
    if not salt:
        salt = os.environ.get("BPL_MOSAIC_SALT", "")
    if salt:
        kernel.__name__ = f"{kernel.__name__}_{salt}"
    return kernel


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
        body = _pd_body(model, accel, gamma, f, alphas, masks)

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

    return schedule_salt(kernel, key="pdps_warm" if warm else "pdps_cold")


# ---------------------------------------------------------------------------
# Spatially-tiled kernel: images whose solver state exceeds VMEM
# ---------------------------------------------------------------------------
#
# The batch kernel above keeps a whole image's state VMEM-resident for all
# maxiter iterations.  Beyond ~640² (float32, K=1) that no longer fits, and
# round 1 silently fell back to the jnp/HBM path.  The tiled scheme instead
# runs CHUNKS of T iterations per kernel invocation on overlapping row
# tiles (redundant-computation trapezoid): each PDPS iteration's stencil
# reach is 2 rows (div then grad), so a halo of H = 2T rows makes every
# tile-interior value after T in-VMEM iterations EXACT.  Between chunks the
# (u, ys) state round-trips HBM once — ~T× less HBM traffic than the jnp
# path's per-iteration round trips.  Boundary masks are evaluated at GLOBAL
# row coordinates (make_masks(row_offset=...)), so the true image boundary
# is handled exactly wherever it falls and padding garbage cannot cross it.

def _make_tiled_kernel(model: DenoiseModel, T: int, accel: bool,
                       gamma: float, alpha_is_map: tuple[bool, ...],
                       n_rows_global: int, n_tiles: int, tile_rows: int,
                       halo: int):
    K = model.K

    def kernel(*refs):
        sc_ref = refs[0]           # SMEM (2,): [tau, sigma] for this chunk
        f_ref = refs[1]
        alpha_refs = refs[2:2 + K]
        u0_ref = refs[2 + K]
        ys0_refs = refs[3 + K:3 + K + 2 * K]
        u_out = refs[3 + 3 * K]
        ys_out_refs = refs[4 + 3 * K:4 + 5 * K]

        f = f_ref[:]
        dtype = f.dtype
        alphas = []
        for k, is_map in enumerate(alpha_is_map):
            alphas.append(alpha_refs[k][:] if is_map
                          else alpha_refs[k][0, 0])
        # tile's global row offset, derived from the grid position (grid is
        # image-major: o = img·n_tiles + tile)
        tile_idx = pl.program_id(0) % n_tiles
        row_offset = tile_idx * tile_rows - halo
        masks = make_masks(f.shape, row_offset=row_offset,
                           n_rows_global=n_rows_global)
        body = _pd_body(model, accel, gamma, f, alphas, masks)

        carry0 = (u0_ref[:], tuple(r[:] for r in ys0_refs),
                  sc_ref[0].astype(dtype), sc_ref[1].astype(dtype))
        u, ys, _, _ = lax.fori_loop(0, T, body, carry0)
        u_out[:] = u
        for r, y in zip(ys_out_refs, ys):
            r[:] = y

    return schedule_salt(kernel, key="pdps_tiled")


def _accel_schedule(tau, sigma, gamma, accel: bool, n: int):
    """Advance the (τ, σ) acceleration recurrence by n iterations (scalar
    mirror of the in-kernel updates, keeping driver and kernel in sync)."""
    if not accel:
        return tau, sigma

    def step(_, c):
        t, s = c
        omega = lax.rsqrt(1.0 + 2.0 * gamma * t)
        return (t * omega, s / omega)

    return lax.fori_loop(0, n, step, (tau, sigma))


@functools.partial(
    jax.jit,
    static_argnames=("model", "maxiter", "accel", "interpret", "tau0",
                     "sigma0", "gamma", "tol", "check_every", "tile_rows",
                     "chunk_iters", "return_state"))
def _tiled_impl(f, alphas, state0=None, *, model, tau0, sigma0, gamma,
                maxiter, accel, interpret, tol=None, check_every: int = 500,
                tile_rows: int, chunk_iters: int, return_state=False):
    O, M, N = f.shape
    dtype = f.dtype
    K = model.K
    L = float(model.opnorm_sq()) ** 0.5
    T = int(chunk_iters)
    H = 2 * T
    n_tiles = -(-M // tile_rows)
    M_pad = n_tiles * tile_rows
    rows = tile_rows + 2 * H

    def pad_rows(x):
        return jnp.pad(x, ((0, 0), (H, M_pad - M + H), (0, 0)))

    def to_tiles(x):
        xp = pad_rows(x)
        t = jnp.stack([lax.slice_in_dim(xp, i * tile_rows,
                                        i * tile_rows + rows, axis=1)
                       for i in range(n_tiles)], axis=1)
        return t.reshape(x.shape[0] * n_tiles, rows, N)

    def from_tiles(t, O_):
        t = t.reshape(O_, n_tiles, rows, N)[:, :, H:H + tile_rows]
        return t.reshape(O_, M_pad, N)[:, :M]

    f_tiles = to_tiles(f)

    alpha_is_map = tuple(a.ndim >= 2 for a in alphas)
    tile_spec = pl.BlockSpec((1, rows, N), lambda o: (o, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # tau/sigma
        tile_spec,                                               # f
    ]
    alpha_args = []
    for a, is_map in zip(alphas, alpha_is_map):
        if is_map:
            alpha_args.append(to_tiles(a.astype(dtype)[None]))
            in_specs.append(pl.BlockSpec(
                (1, rows, N), lambda o: (o % n_tiles, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            alpha_args.append(jnp.reshape(a.astype(dtype), (1, 1)))
            in_specs.append(pl.BlockSpec((1, 1), lambda o: (0, 0),
                                         memory_space=pltpu.SMEM))
    in_specs += [tile_spec] * (1 + 2 * K)                        # u0, ys0
    out_specs = [tile_spec] * (1 + 2 * K)
    out_shape = [jax.ShapeDtypeStruct((O * n_tiles, rows, N), dtype)] \
        * (1 + 2 * K)

    kernel = _make_tiled_kernel(model, T, bool(accel), float(gamma),
                                alpha_is_map, M, n_tiles, tile_rows, H)
    grid = O * n_tiles

    def halo_exchange(t):
        """Refresh each tile's halos from its neighbors' (exact) interiors,
        entirely in tiled space: the top halo of tile i is tile i−1's local
        rows [tile_rows, tile_rows+H), the bottom halo is tile i+1's local
        rows [H, 2H) — two rolled slices + a concat, no gathers and no
        reassemble/retile round trip.  Boundary tiles receive wrapped
        garbage in their outermost halos, which the global-coordinate
        boundary masks keep dead."""
        t4 = t.reshape(O, n_tiles, rows, N)
        top = jnp.roll(t4, 1, axis=1)[:, :, tile_rows:tile_rows + H]
        mid = t4[:, :, H:H + tile_rows]
        bot = jnp.roll(t4, -1, axis=1)[:, :, H:2 * H]
        return jnp.concatenate([top, mid, bot],
                               axis=2).reshape(O * n_tiles, rows, N)

    def run_chunk(kern, u_t, planes_t, tau, sigma, n_iters):
        sc = jnp.stack([tau, sigma]).astype(dtype)
        outs = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=bool(interpret),
        )(sc, f_tiles, *alpha_args, u_t, *planes_t)
        u_t = halo_exchange(outs[0])
        planes_t = tuple(halo_exchange(o) for o in outs[1:])
        tau, sigma = _accel_schedule(tau, sigma,
                                     jnp.asarray(gamma, dtype), accel,
                                     n_iters)
        return u_t, planes_t, tau, sigma

    if state0 is not None:
        u0, ys0 = state0
        planes = tuple(y[..., c, :, :] for y in ys0 for c in (0, 1))
    else:
        u0 = f
        planes = tuple(jnp.zeros_like(f) for _ in range(2 * K))
    u_t = to_tiles(u0)
    planes_t = tuple(to_tiles(p) for p in planes)
    tau = jnp.asarray(tau0 / L, dtype)
    sigma = jnp.asarray(sigma0 / L, dtype)

    n_full, tail = divmod(int(maxiter), T)

    if tol is None:
        def round_body(_, c):
            u_t, planes_t, tau, sigma = c
            return run_chunk(kernel, u_t, planes_t, tau, sigma, T)

        u_t, planes_t, tau, sigma = lax.fori_loop(
            0, n_full, round_body, (u_t, planes_t, tau, sigma))
    else:
        tol_ = jnp.asarray(tol, dtype)
        # with early stopping the budget rounds up to whole chunks (at most
        # T−1 iterations beyond maxiter when tol is never reached)
        n_rounds = -(-int(maxiter) // T)
        # honor check_every: the relative change is measured against a
        # snapshot from q rounds (≈ check_every iterations) ago, so the
        # stopping criterion matches the batch-kernel/jnp granularity
        # instead of the much-stricter per-T-iteration change
        q = max(1, round(check_every / T))
        # the tiled layout duplicates halo rows and carries padded rows
        # past M (which evolve nonzero through the boundary stencils) —
        # count each valid image row exactly once, like the batch kernel
        ridx = np.arange(rows)
        owned = (ridx >= H) & (ridx < H + tile_rows)
        gl = (np.arange(n_tiles)[:, None] * tile_rows + (ridx - H)[None, :])
        w_np = (owned[None, :] & (gl < M)).astype(np.float64)
        w_valid = jnp.asarray(w_np[None, :, :, None], dtype)  # (1,nt,rows,1)

        def _masked_sum(t4):
            return jnp.sum(w_valid * t4)

        def cond(c):
            _, _, _, _, _, r, delta = c
            return jnp.logical_and(r < n_rounds, delta > tol_)

        def round_body(c):
            u_t, planes_t, tau, sigma, u_snap, r, delta = c
            u_new, planes_t, tau, sigma = run_chunk(kernel, u_t, planes_t,
                                                    tau, sigma, T)
            check = (r + 1) % q == 0
            u4 = u_new.reshape(O, n_tiles, rows, N)
            s4 = u_snap.reshape(O, n_tiles, rows, N)
            num = _masked_sum((u4 - s4) ** 2)
            den = jnp.maximum(_masked_sum(u4 ** 2),
                              jnp.asarray(1e-24, dtype))
            delta = jnp.where(check, jnp.sqrt(num / den), delta)
            u_snap = jnp.where(check, u_new, u_snap)
            return (u_new, planes_t, tau, sigma, u_snap, r + 1, delta)

        u_t, planes_t, tau, sigma, _, _, _ = lax.while_loop(
            cond, round_body,
            (u_t, planes_t, tau, sigma, u_t, jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, dtype)))

    if tail and tol is None:
        # remainder chunk with its own static trip count (exact maxiter)
        tail_kernel = _make_tiled_kernel(model, tail, bool(accel),
                                         float(gamma), alpha_is_map, M,
                                         n_tiles, tile_rows, H)
        u_t, planes_t, tau, sigma = run_chunk(tail_kernel, u_t, planes_t,
                                              tau, sigma, tail)

    u = from_tiles(u_t, O)
    planes = tuple(from_tiles(p, O) for p in planes_t)
    if return_state:
        ys = tuple(jnp.stack([planes[2 * k], planes[2 * k + 1]], axis=-3)
                   for k in range(K))
        return u, (u, ys)
    return u


# Empirical Mosaic scoped-VMEM ceiling on the v5e for this kernel's block
# set: a tile PLANE (rows × N × itemsize) of ~1.0 MB compiles for K=1
# (288×1024 and 128×2048 f32 work; 384×1024 and 136×2048 OOM the 16 MB
# scoped limit); K>1 adds 4 blocks per extra regularizer, scaled below.
_TILE_PLANE_BYTES = 960 * 1024


def _tile_plan(M: int, N: int, K: int, itemsize: int,
               chunk_iters: int = 8):
    """Pick (tile_rows, chunk_iters) so one tile's kernel state fits the
    VMEM budget; returns None when even a minimal tile cannot fit.

    Larger tiles amortize the 2H halo (redundant compute ∝ (tile+2H)/tile),
    shorter chunks shrink H — empirically tile≈224/T=8 wins at 1024²."""
    plane_cap = int(_TILE_PLANE_BYTES * 2 / (1 + K))
    rows_max = plane_cap // (N * itemsize)
    for T in (chunk_iters, 6, 4):
        H = 2 * T
        tile = (rows_max - 2 * H) // 8 * 8
        if tile >= max(2 * H, 32):
            tile = min(tile, M)
            # balance: same tile count, evenly-sized tiles (less padding)
            n_tiles = -(-M // tile)
            tile = min(tile, -(-(-(-M // n_tiles)) // 8) * 8)
            return tile, T
    return None


# Budgets for the kernel's live-plane estimate, and the Mosaic scoped VMEM
# limit passed to the compiler (v5e has 128 MiB/core; Mosaic's default
# limit is 16 MiB).  The limit carries ~2x headroom over the estimate —
# Mosaic's stack allocator measured up to ~2x the naive estimate.
#
# Two budgets, both swept on v5e (batch-256 128² / batch-10 128² /
# 1×1024², scalar-reduce-synced timing):
# - _VMEM_BUDGET sizes batch chunks; 8 MiB measured fastest (77.3
#   Gpix·iter/s at batch-256 vs 74.2 at 32 MiB) — small chunks pipeline
#   better than VMEM-pressure-heavy big ones.
# - _RESIDENT_BUDGET gates whole-image residency for images whose state
#   exceeds _VMEM_BUDGET but still fits VMEM: at 1×1024²/5000 iters the
#   resident kernel runs 0.088 s vs 0.116 s spatially-tiled (no ~30%
#   halo recompute, no per-chunk HBM round-trip) vs 0.203 s jnp.
_VMEM_BUDGET = 8 * 1024 * 1024
_RESIDENT_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _vmem_chunk(O: int, M: int, N: int, K: int, itemsize: int,
                n_alpha_maps: int = 0, extra_planes: int = 0,
                budget: int | None = None) -> int:
    """Batch-chunk size keeping kernel state within a VMEM budget.

    Returns 0 when even a single image's solver state exceeds the budget.
    Callers first retry with ``budget=_RESIDENT_BUDGET`` (a single large
    image resident in VMEM beats tiling), then fall back to the
    spatially-tiled kernel, then to the HBM-resident jnp path.
    """
    # live planes per image: u, f, ubar, div, 2K duals (+2K temps);
    # spatially-varying α maps add 2 shared planes each (α and α², not
    # per-image, but budgeted conservatively against the same pool);
    # extra_planes covers early-stop (u_prev) and warm-start inputs
    if budget is None:
        budget = _VMEM_BUDGET
    planes = 4 + 4 * K + extra_planes
    shared = 2 * n_alpha_maps * M * N * itemsize
    chunk = max(budget - shared, 0) // (planes * M * N * itemsize)
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
    extra = ((1 if tol is not None else 0)
             + ((1 + 2 * K) if warm else 0)
             + (2 * K if return_state else 0))   # dual output blocks
    chunk = _vmem_chunk(O, M, N, K, dtype.itemsize,
                        n_alpha_maps=sum(alpha_is_map), extra_planes=extra)
    if chunk < 1:
        # a single image's state exceeds the chunking budget — a resident
        # whole image is still faster than tiling if it fits the larger
        # resident budget (measured: 0.088 s vs 0.116 s at 1024², 5k iters)
        chunk = _vmem_chunk(O, M, N, K, dtype.itemsize,
                            n_alpha_maps=sum(alpha_is_map),
                            extra_planes=extra, budget=_RESIDENT_BUDGET)
        chunk = min(chunk, 1)
    if chunk < 1:
        # too large even resident: spatially tiled kernel (T-iteration
        # chunks over halo'd row tiles); jnp/HBM path only if even a
        # minimal tile cannot fit
        plan = _tile_plan(M, N, K, dtype.itemsize)
        if plan is not None:
            tile_rows, T = plan
            return _tiled_impl(
                f, alphas, state0, model=model, tau0=tau0, sigma0=sigma0,
                gamma=gamma, maxiter=maxiter, accel=accel,
                interpret=interpret, tol=tol, check_every=check_every,
                tile_rows=tile_rows, chunk_iters=T,
                return_state=return_state)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
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
