"""Fused Pallas kernel for the augmented-Lagrangian exact hypergradient.

:func:`bpldenoising_tpu.solvers.hypergrad.exact_hypergrad` runs its
preconditioned CG through XLA with every iterate round-tripping HBM
(~10 planes × batch per CG iteration).  This kernel keeps the whole AL
iteration — active-set pieces, multipliers, CG workspace — VMEM-resident
for the full solve: u and ū are read once, the adjoint p and the K scalar
gradients are written once.  In the fused trust-region loop
(:mod:`bpldenoising_tpu.bilevel.fused`) the hypergradient is one of the
two per-evaluation device costs, so this closes the last HBM-bound stage
of the flagship path.

Semantics match ``exact_hypergrad`` exactly for scalar/vector α (the
batched JOINT system: CG inner products reduce over the whole batch, the
same joint solve the fused loop uses): same SPD operator
M = I + Σₖ Gₖᵀ[μ·actₖ + inactₖ·αₖ·Hₖ]Gₖ, same Jacobi preconditioner from
exact stencil Gram diagonals, same multiplier iteration λₖ ← λₖ + μ·actₖ·Gₖp,
and the same relative-residual CG stop (‖r‖ ≤ tol·‖b‖, ``krylov.cg``).
Patch parameters (per-pixel gradient maps) use the jnp path.

Reference: the sparse-LU active-set system at
``/root/reference/src/TVLearningFunctionVec.jl:98-135`` /
``src/SumRegsLearningFunction.jl:264-327``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import DenoiseModel
from .hypergrad import HypergradConfig, _defaults
from .krylov import KrylovInfo
from .pdps_pallas import (_div_pair, _grad_pair, _gram_axis, _stencil_kind,
                          _VMEM_LIMIT, make_masks,
                          schedule_salt)

__all__ = ["exact_hypergrad_pallas", "reg_hypergrad_pallas",
           "hypergrad_pallas_supported"]


def _hg_kernel(model: DenoiseModel, K: int, al_iters: int, cg_maxiter: int,
               alpha_is_map, want_maps: bool, reg: bool = False):
    ops = model.ops
    kinds = [_stencil_kind(op) for op in ops]
    n_maps = sum(alpha_is_map)

    def kernel(*refs):
        scalars_ref, u_ref, utrue_ref, p0_ref = refs[:4]
        amap_refs = refs[4:4 + n_maps]
        g_out, p_out, stats_out = refs[4 + n_maps:]
        u = u_ref[:]
        utrue = utrue_ref[:]
        dtype = u.dtype
        masks = make_masks(u.shape)

        # slot 0 is act_tol for the exact form, gamma for the reg form
        act_tol = gamma = scalars_ref[0]
        mu = scalars_ref[1]
        cg_tol = scalars_ref[2]
        alphas = []
        i_s, i_m = 3, 0
        for is_map in alpha_is_map:
            if is_map:
                alphas.append(amap_refs[i_m][:])   # (M, N), broadcasts
                i_m += 1
            else:
                alphas.append(scalars_ref[i_s])
                i_s += 1

        # per-k pieces (persisted: Gu, act, inv_den).  Exact form: the
        # active set is |∇u| < act_tol and its dual block carries the
        # penalty μ.  Reg (γ-Huber) form: roles swap — "active" means
        # |∇u| > 1/γ (the non-smoothed region) and α multiplies the whole
        # block (dual-space form; see solvers/hypergrad.py).
        pieces = []
        for k in range(K):
            Gux, Guy = _grad_pair(ops[k], u, masks)
            nGu = jnp.sqrt(Gux * Gux + Guy * Guy)
            tiny_ = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
            if reg:
                act = (nGu > 1.0 / gamma).astype(dtype)
                inv_den = jnp.where(act > 0,
                                    1.0 / jnp.maximum(nGu, tiny_), 1.0)
            else:
                act = (nGu < act_tol).astype(dtype)
                inv_den = jnp.where(act > 0, 1.0,
                                    1.0 / jnp.maximum(nGu, tiny_))
            pieces.append((k, Gux, Guy, act, inv_den))

        def M_apply(p):
            out = p
            for k, Gux, Guy, act, inv_den in pieces:
                Gpx, Gpy = _grad_pair(ops[k], p, masks)
                dot3 = (Gux * Gpx + Guy * Gpy) * inv_den ** 3
                inact = 1.0 - act
                if reg:
                    wx = alphas[k] * (gamma * inact * Gpx
                                      + act * (Gpx * inv_den - Gux * dot3))
                    wy = alphas[k] * (gamma * inact * Gpy
                                      + act * (Gpy * inv_den - Guy * dot3))
                else:
                    wx = mu * act * Gpx + inact * alphas[k] * (
                        Gpx * inv_den - Gux * dot3)
                    wy = mu * act * Gpy + inact * alphas[k] * (
                        Gpy * inv_den - Guy * dot3)
                out = out + _div_pair(ops[k], wx, wy, masks)
            return out

        # Jacobi preconditioner from exact stencil Gram diagonals
        diag = jnp.ones_like(u)
        # NOTE: expression EMISSION ORDER here is deliberately verbatim
        # per branch — hoisting shared subexpressions reordered the traced
        # ops and Mosaic's schedule regressed the fused flagship ~25%
        # (bisected to exactly such a reordering)
        for k, Gux, Guy, act, inv_den in pieces:
            inact = 1.0 - act
            inv_den3 = inv_den ** 3
            if reg:
                wdx = alphas[k] * (gamma * inact + act * (
                    inv_den - Gux * Gux * inv_den3))
                wdy = alphas[k] * (gamma * inact + act * (
                    inv_den - Guy * Guy * inv_den3))
            else:
                wdx = mu * act + inact * alphas[k] * (
                    inv_den - Gux * Gux * inv_den3)
                wdy = mu * act + inact * alphas[k] * (
                    inv_den - Guy * Guy * inv_den3)
            diag = diag + _gram_axis(kinds[k], wdx, -2, masks) \
                        + _gram_axis(kinds[k], wdy, -1, masks)
        inv_diag = 1.0 / diag

        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

        def cg_solve(b, p):
            """krylov.cg semantics: preconditioned CG, stop at
            ‖r‖ ≤ cg_tol·‖b‖ or cg_maxiter (squared-norm comparisons)."""
            bb = jnp.maximum(jnp.sum(b * b), tiny)
            stop2 = (cg_tol * cg_tol) * bb
            r = b - M_apply(p)
            z = inv_diag * r
            d = z
            rz = jnp.sum(r * z)

            def cond(c):
                p_, r_, z_, d_, rz_, it = c
                return jnp.logical_and(it < cg_maxiter,
                                       jnp.sum(r_ * r_) > stop2)

            def body(c):
                p_, r_, z_, d_, rz_, it = c
                Md = M_apply(d_)
                denom = jnp.sum(d_ * Md)
                a = rz_ / jnp.where(denom == 0, 1.0, denom)
                p_ = p_ + a * d_
                r_ = r_ - a * Md
                z_ = inv_diag * r_
                rz_new = jnp.sum(r_ * z_)
                beta = rz_new / jnp.where(rz_ == 0, 1.0, rz_)
                d_ = z_ + beta * d_
                return (p_, r_, z_, d_, rz_new, it + 1)

            p, r, _, _, _, it = lax.while_loop(
                cond, body, (p, r, z, d, rz, jnp.int32(0)))
            return p, jnp.sum(r * r), bb, it

        if reg:
            # single SPD solve, rhs = ū − u, no multipliers
            p = p0_ref[:]
            p, rr, bb, it = cg_solve(utrue - u, p)
        else:
            rhs0 = u - utrue
            p = p0_ref[:]
            lams = [(jnp.zeros_like(u), jnp.zeros_like(u))
                    for _ in range(K)]
            rr = bb = jnp.asarray(0.0, dtype)
            it = jnp.int32(0)
            for i in range(max(1, al_iters)):   # static unroll
                b = rhs0
                for (k, _, _, act, _), (lx, ly) in zip(pieces, lams):
                    b = b - _div_pair(ops[k], act * lx, act * ly, masks)
                p, rr, bb, it = cg_solve(b, p)
                if i < max(1, al_iters) - 1:
                    new_lams = []
                    for (k, _, _, act, _), (lx, ly) in zip(pieces, lams):
                        Gpx, Gpy = _grad_pair(ops[k], p, masks)
                        new_lams.append((lx + mu * act * Gpx,
                                         ly + mu * act * Gpy))
                    lams = new_lams

        for k, Gux, Guy, act, inv_den in pieces:
            inact = 1.0 - act
            Gpx, Gpy = _grad_pair(ops[k], p, masks)
            if reg:
                field_scale = act * inv_den + gamma * inact
            else:
                field_scale = inact * inv_den
            # exact form carries a minus sign; keep the negation OUTSIDE
            # the reduction for the scalar output — negating the full
            # tensor before reduce_sum measured ~2 ms/call slower through
            # Mosaic (flagship regression, bisected to exactly this)
            pos = Gpx * Gux * field_scale + Gpy * Guy * field_scale
            if want_maps:
                g_out[k] = pos if reg else -pos
            else:
                s = jnp.sum(pos)
                g_out[k] = s if reg else -s
        p_out[:] = p
        stats_out[0] = rr
        stats_out[1] = bb
        stats_out[2] = it.astype(dtype)

    return schedule_salt(kernel, key="hg_reg" if reg else "hg")


def hypergrad_vmem_planes(K: int, n_maps: int, want_maps: bool) -> int:
    """Live-plane estimate: u, ū, p + CG (r, z, d, Md) + per-k persisted
    pieces (Gu 2, act, inv_den) + lams (2K) + temps (~4) + α maps and
    per-k gradient-map outputs when requested."""
    return 7 + 6 * K + 4 + n_maps + (K if want_maps else 0)


def hypergrad_pallas_supported(alphas) -> bool:
    """True when every α is a scalar or a full-size per-pixel map (patch
    parameters must be upsampled by the caller, as in the learning
    functions and the fused loop)."""
    return all(jnp.ndim(a) in (0, 2) for a in alphas)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "want_maps",
                                             "interpret"))
def exact_hypergrad_pallas(u, utrue, alphas, model: DenoiseModel,
                           cfg: HypergradConfig = HypergradConfig(),
                           want_maps: bool = False,
                           p0=None, interpret: bool = False):
    """Drop-in for :func:`..solvers.hypergrad.exact_hypergrad` with the
    full AL iteration fused into one VMEM-resident kernel.  Accepts the
    same (optionally batched) ``u``/``utrue``, scalar or full-size-map α,
    and ``want_maps`` (per-image per-pixel gradient maps, for patch
    parameters); returns ``(grads, p, KrylovInfo)``.
    """
    dtype = u.dtype
    K = model.K
    act_tol, mu, cg_tol = _defaults(dtype, cfg)
    alphas = tuple(jnp.asarray(a, dtype) for a in alphas)
    if not hypergrad_pallas_supported(alphas):
        raise ValueError(
            "pallas hypergradient needs scalar or full-size (M, N) map α")
    alpha_is_map = tuple(a.ndim == 2 for a in alphas)
    n_maps = sum(alpha_is_map)

    planes = hypergrad_vmem_planes(K, n_maps, want_maps)
    if planes * u.size * dtype.itemsize > _VMEM_LIMIT // 2:
        raise ValueError("problem too large for the fused hypergradient "
                         "kernel; use exact_hypergrad (jnp)")

    return _run(u, utrue, alphas, model, cfg,
                jnp.asarray([act_tol, mu, cg_tol], dtype),
                cg_tol, want_maps, p0, interpret, reg=False)


@functools.partial(jax.jit, static_argnames=("model", "cfg", "want_maps",
                                             "interpret"))
def reg_hypergrad_pallas(u, utrue, alphas, model: DenoiseModel,
                         cfg: HypergradConfig = HypergradConfig(),
                         want_maps: bool = False,
                         p0=None, interpret: bool = False):
    """Drop-in for :func:`..solvers.hypergrad.reg_hypergrad` — the
    γ-smoothed (Huber/implicit-differentiation) branch as one
    VMEM-resident solve (same skeleton as the exact kernel with the
    act/inact roles swapped, α multiplying the whole dual block, a single
    CG solve on ū − u, and positive-sign gradients)."""
    dtype = u.dtype
    K = model.K
    _, _, cg_tol = _defaults(dtype, cfg)
    alphas = tuple(jnp.asarray(a, dtype) for a in alphas)
    if not hypergrad_pallas_supported(alphas):
        raise ValueError(
            "pallas hypergradient needs scalar or full-size (M, N) map α")
    n_maps = sum(a.ndim == 2 for a in alphas)
    planes = hypergrad_vmem_planes(K, n_maps, want_maps)
    if planes * u.size * dtype.itemsize > _VMEM_LIMIT // 2:
        raise ValueError("problem too large for the fused hypergradient "
                         "kernel; use reg_hypergrad (jnp)")
    return _run(u, utrue, alphas, model, cfg,
                jnp.asarray([cfg.gamma, 0.0, cg_tol], dtype),
                cg_tol, want_maps, p0, interpret, reg=True)


def _run(u, utrue, alphas, model, cfg, base_scalars, cg_tol, want_maps,
         p0, interpret, reg):
    dtype = u.dtype
    K = model.K
    alpha_is_map = tuple(a.ndim == 2 for a in alphas)
    n_maps = sum(alpha_is_map)
    scalar_alphas = [a for a in alphas if a.ndim == 0]
    map_alphas = [a for a in alphas if a.ndim == 2]
    scalars = jnp.concatenate(
        [base_scalars]
        + ([jnp.stack(scalar_alphas)] if scalar_alphas else []))
    p0 = jnp.zeros_like(u) if p0 is None else p0

    if want_maps:
        g_shape = jax.ShapeDtypeStruct((K,) + u.shape, dtype)
        g_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        g_shape = jax.ShapeDtypeStruct((K,), dtype)
        g_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = _hg_kernel(model, K, int(cfg.al_iters), int(cfg.cg_maxiter),
                      alpha_is_map, bool(want_maps), reg=bool(reg))
    grads, p, stats = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + n_maps),
        out_specs=(g_spec,
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(g_shape,
                   jax.ShapeDtypeStruct(u.shape, dtype),
                   jax.ShapeDtypeStruct((3,), dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(scalars, u, utrue, p0, *map_alphas)

    rr, bb, iters = stats[0], stats[1], stats[2]
    resnorm = jnp.sqrt(rr)
    # iters dtype mirrors krylov.cg's weak-int counter (int64 under x64)
    info = KrylovInfo(iters.astype(jnp.result_type(int)), resnorm,
                      resnorm <= cg_tol * jnp.sqrt(bb))
    return tuple(grads[k] for k in range(K)), p, info
