"""Fused Pallas TPU kernel for the TGV² inner solve.

Same design as the TV kernel (:mod:`.pdps_pallas`, SURVEY.md §7 step 7):
the whole joint-primal Chambolle–Pock iteration of :mod:`.tgv` — primal
(u, w), duals (p, q), step sizes — lives in a ``fori_loop`` carry inside
ONE kernel, so the 9 state planes never round-trip HBM across the
``maxiter`` (typically 5000) iterations; each image is read once and
written once.  Stencils are the roll+mask forms shared with the TV kernel
(``_dplus``/``_dminus`` and adjoints); the symmetrized gradient E and its
adjoint are inlined from the slice/concat reference
(:mod:`..ops.tgv`), √2-weighted off-diagonal included.

The grid tiles the batch dimension into VMEM-sized chunks (9 carried
planes + temps per image ≈ 3× the TV kernel's working set, so chunks are
proportionally smaller).  Semantics match
:func:`bpldenoising_tpu.solvers.tgv.tgv_denoise_pdps` exactly (that jnp
path is the oracle; ``tests/test_tgv_pallas.py`` asserts agreement in
interpret mode), including warm start, in-kernel chunked early stop, and
state chaining for warm-started trust-region evaluations.
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
from .pdps_pallas import (_dminus, _dminus_T, _dplus, _dplus_T, make_masks,
                          schedule_salt)

__all__ = ["tgv_denoise_pdps_pallas"]

_SQRT2 = math.sqrt(2.0)

# same budgets as the TV kernel (measured there: 8 MiB working sets win;
# Mosaic's stack allocator runs ~2.6× the analytic estimate)
_VMEM_BUDGET = 8 * 1024 * 1024
_RESIDENT_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _sym_grad_planes(wr, wc, m):
    """E(w) as three planes (err, ecc, erc·√2-weighted); the backward-
    difference roll+mask form of :func:`..ops.tgv.sym_grad`."""
    err = _dminus(wr, -2, m)
    ecc = _dminus(wc, -1, m)
    erc = (_dminus(wr, -1, m) + _dminus(wc, -2, m)) / _SQRT2
    return err, ecc, erc


def _sym_div_planes(zrr, zcc, zrc, m):
    """Adjoint Eᵀ of :func:`_sym_grad_planes` → (row, col) planes."""
    out_r = _dminus_T(zrr, -2, m) + _dminus_T(zrc, -1, m) / _SQRT2
    out_c = _dminus_T(zcc, -1, m) + _dminus_T(zrc, -2, m) / _SQRT2
    return out_r, out_c


def _tgv_body(f, a1, a0, masks):
    """One joint-primal CP iteration over the carry
    (u, wr, wc, pr, pc, qrr, qcc, qrc); τ/σ are closure constants (no
    acceleration — the data term is strongly convex in u only, see
    :mod:`.tgv`)."""
    dtype = f.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    a1_sq = a1 * a1
    a0_sq = a0 * a0

    def body(tau, sigma, carry):
        u, wr, wc, pr, pc, qrr, qcc, qrc = carry
        div_p = _dplus_T(pr, -2, masks) + _dplus_T(pc, -1, masks)
        u_new = (u - tau * div_p + tau * f) / (1.0 + tau)
        er, ec = _sym_div_planes(qrr, qcc, qrc, masks)
        wr_new = wr + tau * (pr - er)
        wc_new = wc + tau * (pc - ec)
        ubar = 2.0 * u_new - u
        wbr = 2.0 * wr_new - wr
        wbc = 2.0 * wc_new - wc
        # p-update: dual of ∇u − w
        pr_t = pr + sigma * (_dplus(ubar, -2, masks) - wbr)
        pc_t = pc + sigma * (_dplus(ubar, -1, masks) - wbc)
        n2 = pr_t * pr_t + pc_t * pc_t
        s = jnp.where(n2 <= a1_sq, 1.0, a1 * lax.rsqrt(n2 + tiny))
        pr_new, pc_new = pr_t * s, pc_t * s
        # q-update: dual of E w
        grr, gcc, grc = _sym_grad_planes(wbr, wbc, masks)
        qrr_t = qrr + sigma * grr
        qcc_t = qcc + sigma * gcc
        qrc_t = qrc + sigma * grc
        n2q = qrr_t * qrr_t + qcc_t * qcc_t + qrc_t * qrc_t
        sq = jnp.where(n2q <= a0_sq, 1.0, a0 * lax.rsqrt(n2q + tiny))
        return (u_new, wr_new, wc_new, pr_new, pc_new,
                qrr_t * sq, qcc_t * sq, qrc_t * sq)

    return body


def _make_kernel(maxiter: int, tau_init: float, sigma_init: float, tol,
                 check_every: int, warm: bool, return_state: bool,
                 map_alpha: bool):
    def tgv_kernel(*refs):
        f_ref, a1_ref, a0_ref = refs[0], refs[1], refs[2]
        pos = 3
        if warm:
            state0_refs = refs[pos:pos + 8]
            pos += 8
        out_refs = refs[pos:]

        f = f_ref[:]
        dtype = f.dtype
        if map_alpha:
            # (1, M, N) VMEM blocks shared by every batch chunk; the
            # per-pixel weights broadcast against the (chunk, M, N) planes
            a1 = a1_ref[:][0]
            a0 = a0_ref[:][0]
        else:
            a1 = a1_ref[0, 0]
            a0 = a0_ref[0, 0]
        tau = jnp.asarray(tau_init, dtype)
        sigma = jnp.asarray(sigma_init, dtype)

        if warm:
            carry0 = tuple(r[:] for r in state0_refs)
        else:
            z = jnp.zeros_like(f)
            carry0 = (f,) + (z,) * 7
        masks = make_masks(f.shape)
        body = _tgv_body(f, a1, a0, masks)
        step = functools.partial(body, tau, sigma)

        if tol is None:
            carry = lax.fori_loop(0, maxiter, lambda k, c: step(c), carry0)
        else:
            tol_ = jnp.asarray(tol, dtype)

            def chunk_cond(c):
                return jnp.logical_and(c[-2] < maxiter, c[-1] > tol_)

            def chunk_body(c):
                st, it = c[:-2], c[-2]
                u_prev = st[0]
                n = jnp.minimum(check_every, maxiter - it)
                st = lax.fori_loop(0, n, lambda k, s: step(s), st)
                # block-global relative change (same criterion/caveat as
                # the TV kernel: per-image reductions crash Mosaic layout
                # inference; callers pick tol with the √chunk margin)
                num = jnp.sum((st[0] - u_prev) ** 2)
                den = jnp.maximum(jnp.sum(st[0] ** 2),
                                  jnp.asarray(1e-24, dtype))
                return st + (it + n, jnp.sqrt(num / den))

            out = lax.while_loop(
                chunk_cond, chunk_body,
                carry0 + (jnp.asarray(0, jnp.int32),
                          jnp.asarray(jnp.inf, dtype)))
            carry = out[:-2]

        if return_state:
            for r, plane in zip(out_refs, carry):
                r[:] = plane
        else:
            out_refs[0][:] = carry[0]
            out_refs[1][:] = carry[1]
            out_refs[2][:] = carry[2]

    return schedule_salt(tgv_kernel, key="tgv_map" if map_alpha else "tgv")


def _chunk_size(O: int, M: int, N: int, itemsize: int, extra_planes: int,
                budget: int) -> int:
    # live planes per image: f + 8 carried + ~9 iteration temps (ubar, wbar,
    # stencil intermediates, projection scalars) — conservative 20
    planes = 20 + extra_planes
    return min(O, budget // (planes * M * N * itemsize))


# ---------------------------------------------------------------------------
# Spatially-tiled kernel: images whose 9-plane state exceeds VMEM
# ---------------------------------------------------------------------------
#
# Same redundant-computation halo-chunk scheme as the TV kernel
# (``pdps_pallas._tiled_impl``): run chunks of T joint-CP iterations per
# kernel invocation on overlapping row tiles.  One TGV iteration's stencil
# reach is 2 rows (∇ᵀp/Eᵀq into the primal update, then ∇ū/E w̄ into the
# dual update), so a halo of H = 2T rows makes every tile-interior value
# after T in-VMEM iterations EXACT; between chunks the 8 state planes
# round-trip HBM once (~T× less HBM traffic than the jnp path).  Boundary
# masks are evaluated at GLOBAL row coordinates, so halo/padding garbage
# never crosses the true image boundary.

# TGV carries ~19 blocks per grid step (f + 2 possible weight maps + 8 in
# + 8 out) vs the TV K=1 kernel's 8 — the per-plane budget scales down
# accordingly from the TV kernel's measured 960 KiB ceiling.
_TGV_TILE_PLANE_BYTES = 384 * 1024


def _tgv_tile_plan(M: int, N: int, itemsize: int, chunk_iters: int = 8):
    """Pick (tile_rows, chunk_iters) for the tiled TGV kernel; None when
    even a minimal tile cannot fit (route to the jnp/HBM path)."""
    rows_max = _TGV_TILE_PLANE_BYTES // (N * itemsize)
    for T in (chunk_iters, 6, 4):
        H = 2 * T
        tile = (rows_max - 2 * H) // 8 * 8
        if tile >= max(2 * H, 32):
            tile = min(tile, M)
            n_tiles = -(-M // tile)
            tile = min(tile, -(-(-(-M // n_tiles)) // 8) * 8)
            return tile, T
    return None


def _make_tiled_kernel(T: int, tau_init: float, sigma_init: float,
                       map_alpha: bool, n_rows_global: int, n_tiles: int,
                       tile_rows: int, halo: int):
    def tgv_tiled_kernel(*refs):
        f_ref, a1_ref, a0_ref = refs[0], refs[1], refs[2]
        state0_refs = refs[3:11]
        out_refs = refs[11:]

        f = f_ref[:]
        dtype = f.dtype
        if map_alpha:
            a1 = a1_ref[:][0]
            a0 = a0_ref[:][0]
        else:
            a1 = a1_ref[0, 0]
            a0 = a0_ref[0, 0]
        tau = jnp.asarray(tau_init, dtype)
        sigma = jnp.asarray(sigma_init, dtype)

        # tile's global row offset from the grid position (image-major:
        # o = img·n_tiles + tile)
        tile_idx = pl.program_id(0) % n_tiles
        row_offset = tile_idx * tile_rows - halo
        masks = make_masks(f.shape, row_offset=row_offset,
                           n_rows_global=n_rows_global)
        body = _tgv_body(f, a1, a0, masks)
        step = functools.partial(body, tau, sigma)

        carry = lax.fori_loop(0, T, lambda k, c: step(c),
                              tuple(r[:] for r in state0_refs))
        for r, plane in zip(out_refs, carry):
            r[:] = plane

    return schedule_salt(tgv_tiled_kernel, key="tgv_tiled")


@functools.partial(
    jax.jit,
    static_argnames=("tau0", "sigma0", "maxiter", "tol", "check_every",
                     "tile_rows", "chunk_iters", "return_state",
                     "interpret"))
def _tiled_impl(f, a1, a0, state0=None, *, tau0, sigma0, maxiter, tol,
                check_every, tile_rows: int, chunk_iters: int,
                return_state, interpret):
    import numpy as np

    O, M, N = f.shape
    dtype = f.dtype
    L = TGV_OPNORM_SQ ** 0.5
    T = int(chunk_iters)
    H = 2 * T
    n_tiles = -(-M // tile_rows)
    M_pad = n_tiles * tile_rows
    rows = tile_rows + 2 * H
    map_alpha = bool(jnp.ndim(a1) or jnp.ndim(a0))

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
    tile_spec = pl.BlockSpec((1, rows, N), lambda o: (o, 0, 0),
                             memory_space=pltpu.VMEM)
    if map_alpha:
        alpha_spec = pl.BlockSpec((1, rows, N), lambda o: (o % n_tiles, 0, 0),
                                  memory_space=pltpu.VMEM)
        a1_arg = to_tiles(jnp.broadcast_to(a1.astype(dtype), (M, N))[None])
        a0_arg = to_tiles(jnp.broadcast_to(a0.astype(dtype), (M, N))[None])
    else:
        alpha_spec = pl.BlockSpec((1, 1), lambda o: (0, 0),
                                  memory_space=pltpu.SMEM)
        a1_arg = jnp.reshape(a1.astype(dtype), (1, 1))
        a0_arg = jnp.reshape(a0.astype(dtype), (1, 1))
    in_specs = [tile_spec, alpha_spec, alpha_spec] + [tile_spec] * 8
    out_specs = [tile_spec] * 8
    out_shape = [jax.ShapeDtypeStruct((O * n_tiles, rows, N), dtype)] * 8
    grid = O * n_tiles

    def halo_exchange(t):
        """Refresh halos from neighbor interiors, in tiled space (see the
        TV tiled kernel); boundary tiles receive wrapped garbage that the
        global-coordinate masks keep dead."""
        t4 = t.reshape(O, n_tiles, rows, N)
        top = jnp.roll(t4, 1, axis=1)[:, :, tile_rows:tile_rows + H]
        mid = t4[:, :, H:H + tile_rows]
        bot = jnp.roll(t4, -1, axis=1)[:, :, H:2 * H]
        return jnp.concatenate([top, mid, bot],
                               axis=2).reshape(O * n_tiles, rows, N)

    tau_v = float(tau0) / L
    sigma_v = float(sigma0) / L

    def run_chunk_raw(kern, planes_t):
        """One T-iteration chunk; interiors of the outputs are exact, the
        halos are stale until the next :func:`halo_exchange`."""
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=bool(interpret),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(f_tiles, a1_arg, a0_arg, *planes_t)

    def run_chunk(kern, planes_t):
        return tuple(halo_exchange(o) for o in run_chunk_raw(kern,
                                                             planes_t))

    if state0 is not None:
        planes = _state_planes(state0)
    else:
        z = jnp.zeros_like(f)
        planes = (f,) + (z,) * 7
    planes_t = tuple(to_tiles(p) for p in planes)

    kernel = _make_tiled_kernel(T, tau_v, sigma_v, map_alpha, M, n_tiles,
                                tile_rows, H)
    n_full, tail = divmod(int(maxiter), T)

    if tol is None:
        # the FINAL chunk's outputs skip the halo exchange — from_tiles
        # keeps only the (exact) interiors, so refreshing halos that are
        # about to be discarded is pure wasted HBM traffic
        if tail:
            planes_t = lax.fori_loop(
                0, n_full, lambda r, pt: run_chunk(kernel, pt), planes_t)
        elif n_full:
            planes_t = lax.fori_loop(
                0, n_full - 1, lambda r, pt: run_chunk(kernel, pt),
                planes_t)
            planes_t = run_chunk_raw(kernel, planes_t)
    else:
        tol_ = jnp.asarray(tol, dtype)
        # early stopping rounds the budget up to whole chunks (at most
        # T−1 iterations beyond maxiter when tol is never reached) — same
        # semantics as the TV tiled kernel; the final round's halo
        # exchange is kept (the stopping round is data-dependent)
        n_rounds = -(-int(maxiter) // T)
        q = max(1, round(check_every / T))
        # count each valid image row exactly once (halo rows are duplicated
        # and padded rows evolve nonzero through the boundary stencils)
        ridx = np.arange(rows)
        owned = (ridx >= H) & (ridx < H + tile_rows)
        gl = (np.arange(n_tiles)[:, None] * tile_rows + (ridx - H)[None, :])
        w_np = (owned[None, :] & (gl < M)).astype(np.float64)
        w_valid = jnp.asarray(w_np[None, :, :, None], dtype)

        def _masked_sum(t4):
            return jnp.sum(w_valid * t4)

        def cond(c):
            _, _, r, delta = c
            return jnp.logical_and(r < n_rounds, delta > tol_)

        def round_body(c):
            planes_t, u_snap, r, delta = c
            planes_new = run_chunk(kernel, planes_t)
            check = (r + 1) % q == 0
            u4 = planes_new[0].reshape(O, n_tiles, rows, N)
            s4 = u_snap.reshape(O, n_tiles, rows, N)
            num = _masked_sum((u4 - s4) ** 2)
            den = jnp.maximum(_masked_sum(u4 ** 2),
                              jnp.asarray(1e-24, dtype))
            delta = jnp.where(check, jnp.sqrt(num / den), delta)
            u_snap = jnp.where(check, planes_new[0], u_snap)
            return (planes_new, u_snap, r + 1, delta)

        planes_t, _, _, _ = lax.while_loop(
            cond, round_body,
            (planes_t, planes_t[0], jnp.asarray(0, jnp.int32),
             jnp.asarray(jnp.inf, dtype)))

    if tail and tol is None:
        tail_kernel = _make_tiled_kernel(tail, tau_v, sigma_v, map_alpha,
                                         M, n_tiles, tile_rows, H)
        planes_t = run_chunk_raw(tail_kernel, planes_t)

    out = tuple(from_tiles(p, O) for p in planes_t)
    u = out[0]
    w = jnp.stack(out[1:3], axis=-3)
    if return_state:
        state = (u, w, jnp.stack(out[3:5], axis=-3),
                 jnp.stack(out[5:8], axis=-3))
        return u, w, state
    return u, w


@functools.partial(
    jax.jit,
    static_argnames=("maxiter", "tau0", "sigma0", "tol", "check_every",
                     "return_state", "interpret"))
def _pallas_impl(f, a1, a0, state0=None, *, tau0, sigma0, maxiter, tol,
                 check_every, return_state, interpret):
    O, M, N = f.shape
    dtype = f.dtype
    L = TGV_OPNORM_SQ ** 0.5
    warm = state0 is not None
    map_alpha = bool(jnp.ndim(a1) or jnp.ndim(a0))

    extra = (1 if tol is not None else 0) + (8 if warm else 0) \
        + (8 if return_state else 3) + (2 if map_alpha else 0)
    chunk = _chunk_size(O, M, N, dtype.itemsize, extra, _VMEM_BUDGET)
    if chunk < 1:
        chunk = min(1, _chunk_size(O, M, N, dtype.itemsize, extra,
                                   _RESIDENT_BUDGET))
    if chunk < 1:
        # beyond whole-image residency: spatially-tiled halo-chunk kernel
        # (HBM round trip every T iterations instead of every iteration)
        plan = _tgv_tile_plan(M, N, dtype.itemsize)
        if plan is not None:
            return _tiled_impl(
                f, a1, a0, _state_to_tuple(state0), tau0=tau0,
                sigma0=sigma0, maxiter=maxiter, tol=tol,
                check_every=check_every, tile_rows=plan[0],
                chunk_iters=plan[1], return_state=return_state,
                interpret=interpret)
        # last resort: HBM-resident jnp path
        from .tgv import _tgv_impl
        out = _tgv_impl(f, a1, a0, _state_to_tuple(state0),
                        tau0=tau0, sigma0=sigma0, maxiter=maxiter, tol=tol,
                        check_every=check_every, return_state=return_state)
        if return_state:
            u, w, st, _ = out
            return u, w, st
        u, w, _ = out
        return u, w

    grid = (O + chunk - 1) // chunk
    O_pad = grid * chunk

    def pad(x):
        return (jnp.pad(x, ((0, O_pad - O), (0, 0), (0, 0)))
                if O_pad != O else x)

    batch_spec = pl.BlockSpec((chunk, M, N), lambda o: (o, 0, 0),
                              memory_space=pltpu.VMEM)
    if map_alpha:
        # weights broadcast over batch: one (M, N) plane, every grid step
        # maps to the same block (scalar weights expand to maps so a mixed
        # scalar/map pair needs no third kernel variant)
        alpha_spec = pl.BlockSpec((1, M, N), lambda o: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        a1_arg = jnp.broadcast_to(a1.astype(dtype), (M, N))[None]
        a0_arg = jnp.broadcast_to(a0.astype(dtype), (M, N))[None]
    else:
        alpha_spec = pl.BlockSpec((1, 1), lambda o: (0, 0),
                                  memory_space=pltpu.SMEM)
        a1_arg = jnp.reshape(a1.astype(dtype), (1, 1))
        a0_arg = jnp.reshape(a0.astype(dtype), (1, 1))
    in_specs = [batch_spec, alpha_spec, alpha_spec]
    args = [pad(f), a1_arg, a0_arg]
    if warm:
        for plane in _state_planes(state0):
            args.append(pad(plane))
            in_specs.append(batch_spec)

    n_out = 8 if return_state else 3
    kernel = _make_kernel(int(maxiter), float(tau0) / L, float(sigma0) / L,
                          None if tol is None else float(tol),
                          int(check_every), warm, bool(return_state),
                          map_alpha)

    flops_per_iter = 110 * M * N  # 5 stencil pairs + 2 projections, rough
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[batch_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((O_pad, M, N), dtype)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_iter * int(maxiter) * O_pad,
            bytes_accessed=(1 + n_out) * O_pad * M * N * dtype.itemsize,
            transcendentals=0),
        interpret=bool(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*args)
    outs = [o[:O] for o in outs]
    u = outs[0]
    w = jnp.stack(outs[1:3], axis=-3)
    if return_state:
        state = (u, w, jnp.stack(outs[3:5], axis=-3),
                 jnp.stack(outs[5:8], axis=-3))
        return u, w, state
    return u, w


def _state_planes(state):
    """(u, w, p, q) pytree → 8 (O, M, N) kernel planes."""
    u, w, p, q = state
    return (u, w[..., 0, :, :], w[..., 1, :, :], p[..., 0, :, :],
            p[..., 1, :, :], q[..., 0, :, :], q[..., 1, :, :],
            q[..., 2, :, :])


def _state_to_tuple(state):
    return None if state is None else tuple(state)


def tgv_denoise_pdps_pallas(f, alpha1, alpha0, *, tau0=0.99, sigma0=0.99,
                            maxiter: int = 5000, tol=None,
                            check_every: int = 500, state0=None,
                            return_state: bool = False,
                            interpret: bool = False):
    """Drop-in fused-kernel replacement for
    :func:`bpldenoising_tpu.solvers.tgv.tgv_denoise_pdps`; ``alpha1`` /
    ``alpha0`` are scalars or (M, N) per-pixel weight maps (spatially
    varying — e.g. upsampled patch grids; the maps ride VMEM as one
    batch-shared plane each).

    Returns ``(u, w)``; with ``return_state``, ``(u, w, state)`` where
    ``state = (u, w, p, q)`` chains into a later call's ``state0``.
    """
    f = jnp.asarray(f)
    squeeze = f.ndim == 2
    if squeeze:
        f = f[None]
        if state0 is not None:
            state0 = tuple(s[None] for s in state0)
    for name, a in (("alpha1", alpha1), ("alpha0", alpha0)):
        if jnp.ndim(a) not in (0, 2):
            raise ValueError(f"{name} must be a scalar or an (M, N) map, "
                             f"got shape {jnp.shape(a)}")
        if jnp.ndim(a) == 2 and jnp.shape(a) != f.shape[-2:]:
            raise ValueError(f"{name} map shape {jnp.shape(a)} != image "
                             f"shape {f.shape[-2:]}")
    out = _pallas_impl(f, jnp.asarray(alpha1, f.dtype),
                       jnp.asarray(alpha0, f.dtype),
                       _state_to_tuple(state0), tau0=float(tau0),
                       sigma0=float(sigma0), maxiter=int(maxiter),
                       tol=None if tol is None else float(tol),
                       check_every=int(check_every),
                       return_state=bool(return_state),
                       interpret=bool(interpret))
    if return_state:
        u, w, state = out
        if squeeze:
            u, w = u[0], w[0]
            state = tuple(s[0] for s in state)
        return u, w, state
    u, w = out
    return (u[0], w[0]) if squeeze else (u, w)
