"""Spatial-domain decomposition: row-sharded stencils with halo exchange.

SURVEY.md §2c identifies spatial decomposition with halo exchange on the
∇/div stencils as the sequence-parallel analogue for this workload — needed
when images outgrow a single chip's VMEM/HBM (the bundled 128² data does
not, so this is a forward-looking scaling capability, exercised on the
virtual CPU mesh in tests).

An (M, N) image is sharded into row blocks over a 1-D mesh axis.  Each
finite-difference application exchanges exactly one boundary row with each
neighbor via ``jax.lax.ppermute`` (nearest-neighbor ICI traffic); everything
else is local.  :func:`denoise_pdps_row_sharded` runs the full accelerated
PDPS iteration inside ``shard_map`` with the per-iteration halo exchanges
riding the interconnect — the distributed analogue of the fused single-chip
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import DenoiseModel
from ..ops.grad import (
    BwdGradientOp,
    CenteredGradientOp,
    FwdGradientOp,
    dcent,
    dcent_T,
    dminus,
    dminus_T,
    dplus,
    dplus_T,
)

__all__ = ["denoise_pdps_row_sharded", "denoise_pdps_batch_row_sharded",
           "tgv_denoise_pdps_row_sharded",
           "tgv_denoise_pdps_batch_row_sharded",
           "vtv_denoise_pdps_row_sharded",
           "vtv_denoise_pdps_batch_row_sharded",
           "tvl1_denoise_row_sharded",
           "tvl1_denoise_batch_row_sharded", "ROWS_AXIS"]

ROWS_AXIS = "rows"


# ---------------------------------------------------------------------------
# halo primitives (axis 0 of a local (m, N) block)
# ---------------------------------------------------------------------------

def _shard_index():
    return lax.axis_index(ROWS_AXIS)


def _n_shards():
    return lax.axis_size(ROWS_AXIS)


def _from_next(row):
    """Receive ``row`` from the next shard (s+1 → s); last shard gets junk
    (always masked by the caller)."""
    n = _n_shards()
    perm = [(s, (s - 1) % n) for s in range(n)]
    return lax.ppermute(row, ROWS_AXIS, perm)


def _from_prev(row):
    """Receive ``row`` from the previous shard (s−1 → s); shard 0 gets junk."""
    n = _n_shards()
    perm = [(s, (s + 1) % n) for s in range(n)]
    return lax.ppermute(row, ROWS_AXIS, perm)


def _is_first():
    return _shard_index() == 0


def _is_last():
    return _shard_index() == _n_shards() - 1


def _dplus_rows(u):
    """Forward diff along global rows on a local (m, N) block."""
    inner = u[1:] - u[:-1]                       # rows 0..m-2
    nxt = _from_next(u[0])                       # next shard's first row
    last = jnp.where(_is_last(), 0.0, nxt - u[-1])
    return jnp.concatenate([inner, last[None]], axis=0)


def _dplus_T_rows(p):
    """Adjoint of :func:`_dplus_rows` (global dplus_T semantics)."""
    prev = _from_prev(p[-1])                     # previous shard's last row
    prev = jnp.where(_is_first(), 0.0, prev)
    shifted = jnp.concatenate([prev[None], p[:-1]], axis=0)   # p[i-1]
    keep = jnp.where(_is_last(),
                     jnp.concatenate([p[:-1],
                                      jnp.zeros_like(p[-1])[None]], axis=0),
                     p)                           # p masked at global last row
    return shifted - keep


def _dminus_rows(u):
    prev = _from_prev(u[-1])
    prev = jnp.where(_is_first(), u[0], prev)    # ⇒ first global row diff = 0
    shifted = jnp.concatenate([prev[None], u[:-1]], axis=0)
    return u - shifted


def _dminus_T_rows(p):
    # global: out[i] = p[i]·(i≥1) − p[i+1]·(i≤M−2)
    a = jnp.where(_is_first(),
                  jnp.concatenate([jnp.zeros_like(p[0])[None], p[1:]], axis=0),
                  p)
    nxt = _from_next(p[0])
    nxt = jnp.where(_is_last(), 0.0, nxt)
    b = jnp.concatenate([p[1:], nxt[None]], axis=0)
    return a - b


def _dcent_rows(u):
    prev = _from_prev(u[-1])
    nxt = _from_next(u[0])
    up = jnp.concatenate([prev[None], u[:-1]], axis=0)    # u[i-1]
    down = jnp.concatenate([u[1:], nxt[None]], axis=0)    # u[i+1]
    d = 0.5 * (down - up)
    m = u.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, u.shape, 0)
    first_mask = jnp.logical_and(_is_first(), idx == 0)
    last_mask = jnp.logical_and(_is_last(), idx == m - 1)
    return jnp.where(jnp.logical_or(first_mask, last_mask), 0.0, d)


def _dcent_T_rows(p):
    # q = p masked to global interior rows; out = (q[i-1] − q[i+1]) / 2
    m = p.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, p.shape, 0)
    first_mask = jnp.logical_and(_is_first(), idx == 0)
    last_mask = jnp.logical_and(_is_last(), idx == m - 1)
    q = jnp.where(jnp.logical_or(first_mask, last_mask), 0.0, p)
    prev = _from_prev(q[-1])
    prev = jnp.where(_is_first(), 0.0, prev)
    nxt = _from_next(q[0])
    nxt = jnp.where(_is_last(), 0.0, nxt)
    up = jnp.concatenate([prev[None], q[:-1]], axis=0)
    down = jnp.concatenate([q[1:], nxt[None]], axis=0)
    return 0.5 * (up - down)


_ROW_STENCILS = {
    FwdGradientOp: (_dplus_rows, _dplus_T_rows),
    BwdGradientOp: (_dminus_rows, _dminus_T_rows),
    CenteredGradientOp: (_dcent_rows, _dcent_T_rows),
}
_COL_STENCILS = {
    FwdGradientOp: (dplus, dplus_T),
    BwdGradientOp: (dminus, dminus_T),
    CenteredGradientOp: (dcent, dcent_T),
}


def _grad(op, u):
    row_fwd, _ = _ROW_STENCILS[type(op)]
    col_fwd, _ = _COL_STENCILS[type(op)]
    return jnp.stack([row_fwd(u), col_fwd(u, -1)], axis=0)


def _div_adj(op, y):
    _, row_adj = _ROW_STENCILS[type(op)]
    _, col_adj = _COL_STENCILS[type(op)]
    return row_adj(y[0]) + col_adj(y[1], -1)


# ---------------------------------------------------------------------------
# Row-sharded PDPS
# ---------------------------------------------------------------------------

def _local_pdps(model: DenoiseModel, accel: bool, gamma, maxiter: int,
                tau0_v, sigma0_v):
    """Per-shard PDPS body on a local (m, N) row block; every stencil
    application halo-exchanges one boundary row over ``ROWS_AXIS``."""
    def local(f_blk, *alpha_blks):
        u = f_blk
        # 0·f keeps the duals' varying-across-mesh type aligned with the data
        ys = tuple(jnp.zeros((2,) + f_blk.shape, f_blk.dtype)
                   + 0.0 * f_blk[None]
                   for _ in range(model.K))
        tiny = jnp.asarray(jnp.finfo(f_blk.dtype).tiny, f_blk.dtype)

        def body(_, carry):
            u, ys, tau, sigma = carry
            div = None
            for op, y in zip(model.ops, ys):
                d = _div_adj(op, y)
                div = d if div is None else div + d
            u_new = (u - tau * (div - f_blk)) / (1.0 + tau)
            if accel:
                omega = lax.rsqrt(1.0 + 2.0 * gamma * tau)
                tau, sigma = tau * omega, sigma / omega
            else:
                omega = jnp.asarray(1.0, f_blk.dtype)
            ubar = (1.0 + omega) * u_new - omega * u
            ys_new = []
            for op, y, a in zip(model.ops, ys, alpha_blks):
                q = y + sigma * _grad(op, ubar)
                n = jnp.sqrt(q[0] ** 2 + q[1] ** 2)
                r = a
                scale = jnp.where(n <= r, 1.0, r / jnp.maximum(n, tiny))
                ys_new.append(q * scale[None])
            return (u_new, tuple(ys_new), tau, sigma)

        u, _, _, _ = lax.fori_loop(
            0, maxiter, body, (u, ys, tau0_v, sigma0_v))
        return u

    return local


def denoise_pdps_row_sharded(f, alphas, model: DenoiseModel, mesh: Mesh, *,
                             tau0=5.0, sigma0=0.99 / 5.0, gamma=1.0,
                             maxiter=5000, accel=True):
    """Accelerated PDPS on a single (M, N) image row-sharded over ``mesh``.

    Same fixed point as :func:`bpldenoising_tpu.solvers.denoise_pdps`; each
    iteration performs 2 nearest-neighbor halo exchanges per operator
    application over the mesh axis.  M must be divisible by the mesh size.
    """
    f = jnp.asarray(f)
    if f.ndim != 2:
        raise ValueError("row-sharded solver expects a single (M, N) image")
    alphas = tuple(jnp.asarray(a, f.dtype)
                   for a in model.canonical_alphas(alphas))
    n_shards = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_shards:
        raise ValueError(
            f"rows {f.shape[0]} not divisible by mesh size {n_shards}")

    L = jnp.sqrt(jnp.asarray(model.opnorm_sq(), f.dtype))
    tau0_v = jnp.asarray(tau0, f.dtype) / L
    sigma0_v = jnp.asarray(sigma0, f.dtype) / L

    a_specs = tuple(P(ROWS_AXIS, None) if a.ndim >= 2 else P()
                    for a in alphas)

    local = _local_pdps(model, accel, gamma, int(maxiter), tau0_v, sigma0_v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(ROWS_AXIS, None),) + a_specs,
                   out_specs=P(ROWS_AXIS, None))
    return jax.jit(fn)(f, *alphas)


def _local_tgv(maxiter: int, tau_v, sigma_v):
    """Per-shard joint-primal TGV² CP body on a local (m, N) row block
    (state planes u, w_r, w_c, p_r, p_c, q_rr, q_cc, q_rc — the plane
    layout of the fused kernel, :mod:`..solvers.tgv_pallas`); stencils
    along the global rows axis halo-exchange one boundary row, column
    stencils are local.  Weights are scalars or (m, N) row blocks of the
    (M, N) maps."""
    import math
    _SQRT2 = math.sqrt(2.0)

    def local(f_blk, a1, a0):
        dtype = f_blk.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        a1_sq = a1 * a1
        a0_sq = a0 * a0
        z = 0.0 * f_blk      # varying-type zeros (see _local_pdps)
        carry0 = (f_blk, z, z, z, z, z, z, z)

        def body(_, c):
            u, wr, wc, pr, pc, qrr, qcc, qrc = c
            div_p = _dplus_T_rows(pr) + dplus_T(pc, -1)
            u_new = (u - tau_v * div_p + tau_v * f_blk) / (1.0 + tau_v)
            er = _dminus_T_rows(qrr) + dminus_T(qrc, -1) / _SQRT2
            ec = dminus_T(qcc, -1) + _dminus_T_rows(qrc) / _SQRT2
            wr_new = wr + tau_v * (pr - er)
            wc_new = wc + tau_v * (pc - ec)
            ubar = 2.0 * u_new - u
            wbr = 2.0 * wr_new - wr
            wbc = 2.0 * wc_new - wc
            pr_t = pr + sigma_v * (_dplus_rows(ubar) - wbr)
            pc_t = pc + sigma_v * (dplus(ubar, -1) - wbc)
            n2 = pr_t * pr_t + pc_t * pc_t
            s = jnp.where(n2 <= a1_sq, 1.0, a1 * lax.rsqrt(n2 + tiny))
            err = _dminus_rows(wbr)
            ecc = dminus(wbc, -1)
            erc = (dminus(wbr, -1) + _dminus_rows(wbc)) / _SQRT2
            qrr_t = qrr + sigma_v * err
            qcc_t = qcc + sigma_v * ecc
            qrc_t = qrc + sigma_v * erc
            n2q = qrr_t * qrr_t + qcc_t * qcc_t + qrc_t * qrc_t
            sq = jnp.where(n2q <= a0_sq, 1.0, a0 * lax.rsqrt(n2q + tiny))
            return (u_new, wr_new, wc_new, pr_t * s, pc_t * s,
                    qrr_t * sq, qcc_t * sq, qrc_t * sq)

        u, wr, wc, *_ = lax.fori_loop(0, maxiter, body, carry0)
        return u, jnp.stack([wr, wc], axis=0)

    return local


def _tgv_step_sizes(f, tau0, sigma0):
    from ..ops.tgv import TGV_OPNORM_SQ
    L = jnp.sqrt(jnp.asarray(TGV_OPNORM_SQ, f.dtype))
    return (jnp.asarray(tau0, f.dtype) / L,
            jnp.asarray(sigma0, f.dtype) / L)


def _tgv_alpha_spec(a):
    return P(ROWS_AXIS, None) if a.ndim >= 2 else P()


def tgv_denoise_pdps_row_sharded(f, alpha1, alpha0, mesh: Mesh, *,
                                 tau0=0.99, sigma0=0.99, maxiter=5000):
    """Joint-primal TGV² Chambolle–Pock on a single (M, N) image
    row-sharded over ``mesh`` — the spatial-decomposition analogue of
    :func:`..solvers.tgv.tgv_denoise_pdps` for images beyond one chip
    (each iteration: 6 nearest-neighbor halo exchanges riding ICI — ∇ᵀp,
    Eᵀq ×2, ∇ū, E w̄ ×2; the E_cc plane is column-local).
    ``alpha1``/``alpha0`` are scalars or
    (M, N) maps (sharded by rows).  M must divide by the mesh size.

    Returns ``(u, w)`` like the single-chip solver."""
    f = jnp.asarray(f)
    if f.ndim != 2:
        raise ValueError("row-sharded solver expects a single (M, N) image")
    a1 = jnp.asarray(alpha1, f.dtype)
    a0 = jnp.asarray(alpha0, f.dtype)
    n_shards = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_shards:
        raise ValueError(
            f"rows {f.shape[0]} not divisible by mesh size {n_shards}")
    tau_v, sigma_v = _tgv_step_sizes(f, tau0, sigma0)
    local = _local_tgv(int(maxiter), tau_v, sigma_v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(ROWS_AXIS, None), _tgv_alpha_spec(a1),
                             _tgv_alpha_spec(a0)),
                   out_specs=(P(ROWS_AXIS, None), P(None, ROWS_AXIS, None)))
    return jax.jit(fn)(f, a1, a0)


def tgv_denoise_pdps_batch_row_sharded(f, alpha1, alpha0, mesh: Mesh, *,
                                       tau0=0.99, sigma0=0.99,
                                       maxiter=5000):
    """TGV² on an (O, M, N) stack over a 2-D (batch × rows) mesh — the
    TGV analogue of :func:`denoise_pdps_batch_row_sharded` (data
    parallelism composed with spatial decomposition; one batched
    ``ppermute`` per stencil application carries every local image's
    boundary row at once)."""
    f = jnp.asarray(f)
    if f.ndim != 3:
        raise ValueError("expected an (O, M, N) stack")
    a1 = jnp.asarray(alpha1, f.dtype)
    a0 = jnp.asarray(alpha0, f.dtype)
    from .mesh import BATCH_AXIS
    n_batch = mesh.shape[BATCH_AXIS]
    n_rows = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_batch:
        raise ValueError(
            f"batch {f.shape[0]} not divisible by mesh axis {n_batch}")
    if f.shape[1] % n_rows:
        raise ValueError(
            f"rows {f.shape[1]} not divisible by mesh axis {n_rows}")
    tau_v, sigma_v = _tgv_step_sizes(f, tau0, sigma0)
    local = _local_tgv(int(maxiter), tau_v, sigma_v)

    def local_batched(f_blk, a1_blk, a0_blk):
        return jax.vmap(lambda fi: local(fi, a1_blk, a0_blk))(f_blk)

    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=(P(BATCH_AXIS, ROWS_AXIS, None),
                             _tgv_alpha_spec(a1), _tgv_alpha_spec(a0)),
                   out_specs=(P(BATCH_AXIS, ROWS_AXIS, None),
                              P(BATCH_AXIS, None, ROWS_AXIS, None)))
    return jax.jit(fn)(f, a1, a0)


def denoise_pdps_batch_row_sharded(f, alphas, model: DenoiseModel,
                                   mesh: Mesh, *, tau0=5.0,
                                   sigma0=0.99 / 5.0, gamma=1.0,
                                   maxiter=5000, accel=True):
    """PDPS on an (O, M, N) stack sharded over a 2-D (batch × rows) mesh —
    the composition of §2c data parallelism and spatial decomposition.

    The batch axis is embarrassingly parallel (each image is an
    independent problem, mirroring the reference's per-image loop,
    ``/root/reference/src/TVLearningFunctionVec.jl:72-83``); within each
    batch shard the rows axis runs the halo-exchange solver, vmapped over
    the local images (``ppermute`` batches cleanly, so one collective per
    stencil application carries every local image's boundary row at
    once).  O must divide by the batch mesh size and M by the rows size.
    """
    f = jnp.asarray(f)
    if f.ndim != 3:
        raise ValueError("expected an (O, M, N) stack")
    alphas = tuple(jnp.asarray(a, f.dtype)
                   for a in model.canonical_alphas(alphas))
    from .mesh import BATCH_AXIS
    n_batch = mesh.shape[BATCH_AXIS]
    n_rows = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_batch:
        raise ValueError(
            f"batch {f.shape[0]} not divisible by mesh axis {n_batch}")
    if f.shape[1] % n_rows:
        raise ValueError(
            f"rows {f.shape[1]} not divisible by mesh axis {n_rows}")

    L = jnp.sqrt(jnp.asarray(model.opnorm_sq(), f.dtype))
    tau0_v = jnp.asarray(tau0, f.dtype) / L
    sigma0_v = jnp.asarray(sigma0, f.dtype) / L

    a_specs = tuple(P(ROWS_AXIS, None) if a.ndim >= 2 else P()
                    for a in alphas)

    local = _local_pdps(model, accel, gamma, int(maxiter), tau0_v, sigma0_v)

    def local_batched(f_blk, *alpha_blks):
        return jax.vmap(lambda fi: local(fi, *alpha_blks))(f_blk)

    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=(P(BATCH_AXIS, ROWS_AXIS, None),) + a_specs,
                   out_specs=P(BATCH_AXIS, ROWS_AXIS, None))
    return jax.jit(fn)(f, *alphas)


# ---------------------------------------------------------------------------
# Row-sharded vectorial (color) TV
# ---------------------------------------------------------------------------

def _local_vtv(maxiter: int, tau_v, sigma_v):
    """Per-shard channel-coupled CP body on a local (C, m, N) color block.

    The channel axis is LOCAL (the Frobenius coupling is per-pixel, so no
    collective touches it); the vmapped row stencils batch each halo
    exchange into one ``ppermute`` carrying all C boundary rows.  Numerics
    mirror :func:`..solvers.pdps._pdps_step` on ``vtv_model`` (accelerated,
    γ = 1 data term)."""
    row_fwd = jax.vmap(_dplus_rows)
    row_adj = jax.vmap(_dplus_T_rows)

    def local(f_blk, a_blk):
        tiny = jnp.asarray(jnp.finfo(f_blk.dtype).tiny, f_blk.dtype)
        u = f_blk
        zeros = 0.0 * f_blk      # keeps the mesh-varying type of the data
        px = zeros
        py = zeros

        def body(_, carry):
            u, px, py, tau, sigma = carry
            div = row_adj(px) + dplus_T(py, -1)
            u_new = (u - tau * (div - f_blk)) / (1.0 + tau)
            omega = lax.rsqrt(1.0 + 2.0 * tau)
            tau, sigma = tau * omega, sigma / omega
            ubar = (1.0 + omega) * u_new - omega * u
            qx = px + sigma * row_fwd(ubar)
            qy = py + sigma * dplus(ubar, -1)
            # channel-coupled Frobenius projection: one scale per pixel
            # shared by all 2C components
            n = jnp.sqrt(jnp.sum(qx * qx + qy * qy, axis=0, keepdims=True))
            scale = jnp.where(n <= a_blk, 1.0,
                              a_blk / jnp.maximum(n, tiny))
            return u_new, qx * scale, qy * scale, tau, sigma

        u, _, _, _, _ = lax.fori_loop(
            0, maxiter, body, (u, px, py, tau_v, sigma_v))
        return u

    return local


def vtv_denoise_pdps_row_sharded(f, alpha, mesh: Mesh, *, tau0=5.0,
                                 sigma0=0.99 / 5.0, maxiter=5000):
    """Channel-coupled vectorial-TV PDPS on a single (C, M, N) color image
    row-sharded over ``mesh`` — the spatial-decomposition analogue of
    :func:`..solvers.pdps.vtv_denoise` for color images beyond one chip
    (C× the planes of the grayscale solver, so the VMEM ceiling arrives
    at C× smaller resolutions).  ``alpha`` is a scalar or an (M, N) map
    (sharded by rows, shared across channels).  M must divide by the mesh
    size."""
    from ..models import vtv_model
    f = jnp.asarray(f)
    if f.ndim != 3:
        raise ValueError(
            "row-sharded VTV expects a single (C, M, N) color image")
    a = jnp.asarray(alpha, f.dtype)
    n_shards = mesh.shape[ROWS_AXIS]
    if f.shape[1] % n_shards:
        raise ValueError(
            f"rows {f.shape[1]} not divisible by mesh size {n_shards}")
    L = jnp.sqrt(jnp.asarray(vtv_model().opnorm_sq(), f.dtype))
    tau_v = jnp.asarray(tau0, f.dtype) / L
    sigma_v = jnp.asarray(sigma0, f.dtype) / L
    a_spec = P(ROWS_AXIS, None) if a.ndim >= 2 else P()
    local = _local_vtv(int(maxiter), tau_v, sigma_v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, ROWS_AXIS, None), a_spec),
                   out_specs=P(None, ROWS_AXIS, None))
    return jax.jit(fn)(f, a)


def _local_tvl1(maxiter: int, tau_v, sigma_v):
    """Per-shard TV-L1 CP body on a local (m, N) row block.

    Numerics mirror :func:`..solvers.tvl1._tvl1_impl` (UNACCELERATED
    primal–dual with the shift-centered soft-shrinkage primal prox — the
    L1 data term is not strongly convex, so there is no ω schedule);
    the forward-gradient row stencil halo-exchanges one boundary row per
    application, the column stencil is local.  ``a_blk`` is a scalar or
    an (m, N) row block of an (M, N) weight map."""
    def local(f_blk, a_blk):
        dtype = f_blk.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        u = f_blk
        zeros = 0.0 * f_blk      # keeps the mesh-varying type of the data
        yx = zeros
        yy = zeros

        def body(_, carry):
            u, yx, yy = carry
            div = _dplus_T_rows(yx) + dplus_T(yy, -1)
            v = u - tau_v * div - f_blk
            u_new = f_blk + jnp.sign(v) * jnp.maximum(
                jnp.abs(v) - tau_v, 0.0)
            ubar = 2.0 * u_new - u
            qx = yx + sigma_v * _dplus_rows(ubar)
            qy = yy + sigma_v * dplus(ubar, -1)
            n = jnp.sqrt(qx * qx + qy * qy)
            scale = jnp.where(n <= a_blk, 1.0,
                              a_blk / jnp.maximum(n, tiny))
            return u_new, qx * scale, qy * scale

        u, _, _ = lax.fori_loop(0, maxiter, body, (u, yx, yy))
        return u

    return local


def _tvl1_step_sizes(f, tau0, sigma0):
    from ..models import tv_model
    L = jnp.sqrt(jnp.asarray(tv_model().opnorm_sq(), f.dtype))
    return (jnp.asarray(tau0, f.dtype) / L,
            jnp.asarray(sigma0, f.dtype) / L)


def tvl1_denoise_row_sharded(f, alpha, mesh: Mesh, *, tau0=0.99,
                             sigma0=0.99, maxiter=5000):
    """TV-L1 denoising of a single (M, N) image row-sharded over ``mesh``
    — the spatial-decomposition analogue of
    :func:`..solvers.tvl1.tvl1_denoise` for images beyond one chip,
    completing the halo tier for the impulse-noise family (TV, TGV and
    VTV have the same rung).  Each iteration performs 2 nearest-neighbor
    halo exchanges (∇ᵀy and ∇ū).  ``alpha`` is a scalar or an (M, N)
    weight map (sharded by rows).  M must divide by the mesh size."""
    f = jnp.asarray(f)
    if f.ndim != 2:
        raise ValueError("row-sharded solver expects a single (M, N) image")
    a = jnp.asarray(alpha, f.dtype)
    n_shards = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_shards:
        raise ValueError(
            f"rows {f.shape[0]} not divisible by mesh size {n_shards}")
    tau_v, sigma_v = _tvl1_step_sizes(f, tau0, sigma0)
    a_spec = P(ROWS_AXIS, None) if a.ndim >= 2 else P()
    local = _local_tvl1(int(maxiter), tau_v, sigma_v)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(ROWS_AXIS, None), a_spec),
                   out_specs=P(ROWS_AXIS, None))
    return jax.jit(fn)(f, a)


def tvl1_denoise_batch_row_sharded(f, alpha, mesh: Mesh, *, tau0=0.99,
                                   sigma0=0.99, maxiter=5000):
    """TV-L1 on an (O, M, N) stack over a 2-D (batch × rows) mesh — data
    parallelism composed with spatial decomposition (one batched
    ``ppermute`` per stencil application carries every local image's
    boundary row at once), the TV-L1 analogue of
    :func:`denoise_pdps_batch_row_sharded`."""
    f = jnp.asarray(f)
    if f.ndim != 3:
        raise ValueError("expected an (O, M, N) stack")
    a = jnp.asarray(alpha, f.dtype)
    from .mesh import BATCH_AXIS
    n_batch = mesh.shape[BATCH_AXIS]
    n_rows = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_batch:
        raise ValueError(
            f"batch {f.shape[0]} not divisible by mesh axis {n_batch}")
    if f.shape[1] % n_rows:
        raise ValueError(
            f"rows {f.shape[1]} not divisible by mesh axis {n_rows}")
    tau_v, sigma_v = _tvl1_step_sizes(f, tau0, sigma0)
    a_spec = P(ROWS_AXIS, None) if a.ndim >= 2 else P()
    local = _local_tvl1(int(maxiter), tau_v, sigma_v)

    def local_batched(f_blk, a_blk):
        return jax.vmap(lambda fi: local(fi, a_blk))(f_blk)

    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=(P(BATCH_AXIS, ROWS_AXIS, None), a_spec),
                   out_specs=P(BATCH_AXIS, ROWS_AXIS, None))
    return jax.jit(fn)(f, a)


def vtv_denoise_pdps_batch_row_sharded(f, alpha, mesh: Mesh, *, tau0=5.0,
                                       sigma0=0.99 / 5.0, maxiter=5000):
    """Vectorial TV on an (O, C, M, N) color stack over a 2-D
    (batch × rows) mesh — data parallelism composed with spatial
    decomposition (channels local; one batched ``ppermute`` per stencil
    application carries every local image's C boundary rows at once)."""
    from ..models import vtv_model
    f = jnp.asarray(f)
    if f.ndim != 4:
        raise ValueError("expected an (O, C, M, N) color stack")
    a = jnp.asarray(alpha, f.dtype)
    from .mesh import BATCH_AXIS
    n_batch = mesh.shape[BATCH_AXIS]
    n_rows = mesh.shape[ROWS_AXIS]
    if f.shape[0] % n_batch:
        raise ValueError(
            f"batch {f.shape[0]} not divisible by mesh axis {n_batch}")
    if f.shape[2] % n_rows:
        raise ValueError(
            f"rows {f.shape[2]} not divisible by mesh axis {n_rows}")
    L = jnp.sqrt(jnp.asarray(vtv_model().opnorm_sq(), f.dtype))
    tau_v = jnp.asarray(tau0, f.dtype) / L
    sigma_v = jnp.asarray(sigma0, f.dtype) / L
    a_spec = P(ROWS_AXIS, None) if a.ndim >= 2 else P()
    local = _local_vtv(int(maxiter), tau_v, sigma_v)

    def local_batched(f_blk, a_blk):
        return jax.vmap(lambda fi: local(fi, a_blk))(f_blk)

    fn = shard_map(local_batched, mesh=mesh,
                   in_specs=(P(BATCH_AXIS, None, ROWS_AXIS, None), a_spec),
                   out_specs=P(BATCH_AXIS, None, ROWS_AXIS, None))
    return jax.jit(fn)(f, a)
