"""Single-loop first-order bilevel learning — entirely on device.

A modern alternative to the trust-region outer loop (cf. the single-loop
bilevel literature, e.g. Suonperä & Valkonen, "Single-loop methods for
bilevel parameter learning in inverse imaging", arXiv:2408.08123): instead
of solving the lower-level problem to 5000-iteration convergence per outer
evaluation, the inner primal–dual state, the adjoint state and the parameter
are advanced *together*:

    per outer step:
      1. ``n_inner`` PDPS iterations at the current α (warm-started state);
      2. ``n_adj`` preconditioned-CG iterations on the γ-smoothed adjoint
         system at the current iterate (warm-started p);
      3. an Adam step on log α (positivity by construction) using the
         approximate hypergradient.

The whole loop is one ``lax.scan`` under one ``jit`` — no data-dependent
host control flow, zero host↔device round-trips until the final result.
This is a capability beyond the reference (which has only the double-loop
trust region) and reaches the same learned parameters with an order of
magnitude less total PD work; the trust region remains the
reference-faithful default.

Supports every parameterization of the experiment suite: scalar α and
(m, n) patch α for the TV model, (3,) vector and (m, n, 3) patch α for the
sum-of-regularizers model (:func:`single_loop_learn`;
:func:`single_loop_tv_learn` is the scalar-TV convenience wrapper).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map

from ..models import DenoiseModel, sumregs_model, tv_model
from ..ops import PatchOp, scalarprod, xi
from ..solvers.hypergrad import build_reg_system
from .pcg import CG_VARIANTS

__all__ = ["single_loop_learn", "single_loop_tv_learn", "SingleLoopResult"]


class SingleLoopResult(NamedTuple):
    alpha: jnp.ndarray          # learned parameter (original shape)
    u: jnp.ndarray              # final reconstruction stack (O, M, N)
    cost: jnp.ndarray           # final ½Σ‖u−ū‖²
    alpha_trajectory: jnp.ndarray   # (outer, *param_shape)
    cost_trajectory: jnp.ndarray    # (outer,)
    # (outer,) ‖dJ/dα‖₂ per outer step (None on learners that predate it)
    gnorm_trajectory: Optional[jnp.ndarray] = None
    # host-side per-iteration cumulative wall seconds, filled only by the
    # segmented driver (log_every); segment-end granularity, AOT-compiled
    # executables so no JIT time is included
    times: Optional["np.ndarray"] = None


def _bc(m):
    return m[..., None, :, :]


def _check_positive_x0(x0):
    """The parameter lives in log space (x = exp(z)); zero or negative
    entries silently degenerate (log 0 = -inf freezes the parameter at 0,
    negatives poison everything with NaN), so reject them up front.
    No-op on traced values (entry points receive concrete x0)."""
    try:
        bad = bool(jnp.any(jnp.asarray(x0) <= 0))
    except Exception:
        return
    if bad:
        raise ValueError(
            "x0 must be strictly positive: the parameter is optimized in "
            "log space, so 0 freezes it and negatives produce NaN")


def _param_layout(model: DenoiseModel, x0, image_shape):
    """→ (pop, split) where split maps a parameter pytree to K per-image α
    (scalar or map) and back-projects per-k gradient maps."""
    x0 = jnp.asarray(x0)
    K = model.K
    if K == 1:
        if x0.ndim == 0:
            return None, x0.shape
        if x0.ndim == 2:
            return PatchOp(tuple(x0.shape), tuple(image_shape)), x0.shape
    else:
        if x0.ndim == 1 and x0.shape[0] == K:
            return None, x0.shape
        if x0.ndim == 3 and x0.shape[-1] == K:
            return (PatchOp(tuple(x0.shape[:2]), tuple(image_shape)),
                    x0.shape)
    raise ValueError(f"unsupported parameter shape {x0.shape} for K={K}")


@functools.partial(
    jax.jit,
    static_argnames=("model", "outer", "n_inner", "n_adj", "pop",
                     "param_shape", "axis_name", "optimizer",
                     "return_carry", "cg_variant"))
def _single_loop_impl(utrue, f, x0, *, model: DenoiseModel, outer: int,
                      n_inner: int, n_adj: int, pop: Optional[PatchOp],
                      param_shape: tuple, lr, gamma, tau0, sigma0,
                      beta1, beta2, eps, axis_name: Optional[str] = None,
                      optimizer=None, carry0=None,
                      return_carry: bool = False,
                      cg_variant: str = "classic"):
    dtype = f.dtype
    K = model.K
    L = jnp.sqrt(jnp.asarray(model.opnorm_sq(), dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L
    gamma = jnp.asarray(gamma, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    def alphas_of(x):
        """Parameter → K-tuple of per-image α (scalar or (M, N) map)."""
        if K == 1:
            return (pop.apply(x) if pop is not None else x,)
        if pop is None:
            return tuple(x[k] for k in range(K))
        return tuple(pop.apply(x[..., k]) for k in range(K))

    def pullback(gmaps):
        """K per-pixel gradient maps (summed over batch) → parameter shape."""
        if K == 1:
            g = gmaps[0]
            return pop.apply_adjoint(g) if pop is not None else jnp.sum(g)
        if pop is None:
            return jnp.stack([jnp.sum(g) for g in gmaps])
        return jnp.stack([pop.apply_adjoint(g) for g in gmaps], axis=-1)

    def pd_step(alphas, carry):
        u, ys = carry
        div = None
        for op, y in zip(model.ops, ys):
            d = op.apply_adjoint(y)
            div = d if div is None else div + d
        u_new = (u - tau * (div - f)) / (1.0 + tau)
        ubar = 2.0 * u_new - u            # fixed-step (unaccelerated) CP
        ys_new = []
        for op, y, a in zip(model.ops, ys, alphas):
            q = y + sigma * op.apply(ubar)
            n = xi(q)
            r = jnp.asarray(a, dtype)
            if r.ndim >= 2:
                r = r[None]           # broadcast the α map over the batch
            scale = jnp.where(n <= r, 1.0,
                              r / jnp.maximum(n, tiny))[..., None, :, :]
            ys_new.append(q * scale)
        return u_new, tuple(ys_new)

    def adjoint_pieces(u, alphas):
        # shared γ-smoothed system assembly (batched over O)
        return build_reg_system(u, alphas, model, gamma)

    def _vdot(a, b):
        # under data parallelism the dots are GLOBAL (psum) so the fixed
        # n_adj CG steps reproduce the single-device joint iteration
        # exactly (the fixed-step CG never converges, so local-dot per-shard
        # CG would follow a genuinely different trajectory)
        s = jnp.vdot(a, b)
        return lax.psum(s, axis_name) if axis_name is not None else s

    def cg_steps(M_apply, inv_diag, b, p):
        # classic or pipelined Jacobi-PCG (bilevel/pcg.py) with GLOBAL
        # (psum'd) dots under data parallelism
        return CG_VARIANTS[cg_variant](M_apply, inv_diag, b, p, n_adj,
                                       vdot=_vdot)

    def outer_step(carry, _):
        u, ys, p, z, opt_state, t = carry
        x = jnp.exp(z)
        alphas = alphas_of(x)
        u, ys = lax.fori_loop(0, n_inner,
                              lambda k, c: pd_step(alphas, c), (u, ys))
        M_apply, inv_diag, fields = adjoint_pieces(u, alphas)
        p = cg_steps(M_apply, inv_diag, utrue - u, p)
        gmaps = tuple(
            jnp.sum(scalarprod(op.apply(p), field), axis=0)
            for op, field in zip(model.ops, fields))
        if axis_name is not None:
            gmaps = tuple(lax.psum(g, axis_name) for g in gmaps)
        g_x = pullback(gmaps)
        g_z = g_x * x                    # chain rule through x = exp(z)
        t = t + 1
        if optimizer is not None:
            # any optax GradientTransformation on log α
            updates, opt_state = optimizer.update(g_z, opt_state, z)
            z_new = z + updates
        else:
            m, v = opt_state
            m = beta1 * m + (1 - beta1) * g_z
            v = beta2 * v + (1 - beta2) * g_z ** 2
            mhat = m / (1 - beta1 ** t)
            vhat = v / (1 - beta2 ** t)
            z_new = z - lr * mhat / (jnp.sqrt(vhat) + eps)
            opt_state = (m, v)
        cost = 0.5 * jnp.sum((u - utrue) ** 2)
        if axis_name is not None:
            cost = lax.psum(cost, axis_name)
        # trajectory pairs each cost with the α that PRODUCED it (x, not the
        # freshly updated parameter); gnorm is the approximate-hypergradient
        # norm in the ORIGINAL parameterization (g_x, pre-chain-rule) so the
        # perf log is comparable with the trust-region paths' ‖dJ/dα‖
        gnorm = jnp.sqrt(jnp.sum(jnp.asarray(g_x) ** 2))
        return (u, ys, p, z_new, opt_state, t), (x, cost, gnorm)

    if carry0 is None:
        carry0 = _init_carry(f, x0, K=K, param_shape=param_shape,
                             optimizer=optimizer)

    carry, (alphas_traj, costs, gnorms) = lax.scan(outer_step, carry0, None,
                                                   length=outer)
    u, _, _, z, _, _ = carry
    final_cost = 0.5 * jnp.sum((u - utrue) ** 2)
    if axis_name is not None:
        final_cost = lax.psum(final_cost, axis_name)
    res = SingleLoopResult(alpha=jnp.exp(z), u=u,
                           cost=final_cost,
                           alpha_trajectory=alphas_traj,
                           cost_trajectory=costs,
                           gnorm_trajectory=gnorms)
    if return_carry:
        return res, carry
    return res


def _init_carry(f, x0, *, K: int, param_shape: tuple, optimizer=None):
    """Initial scan carry (u, dual blocks, adjoint p, log α, optimizer
    state, step counter) — shared by the in-impl path and the segmented
    host driver (which builds it with GLOBAL padded shapes before sharding
    it through shard_map)."""
    dtype = f.dtype
    zero_like = 0.0 * f[..., None, :, :]
    ys0 = tuple(
        jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) + zero_like
        for _ in range(K))
    z0 = jnp.log(jnp.asarray(x0, dtype))
    if optimizer is not None:
        opt_state0 = optimizer.init(z0)
    else:
        opt_state0 = (jnp.zeros(param_shape, dtype),
                      jnp.zeros(param_shape, dtype))
    return (f, ys0, jnp.zeros_like(f), z0, opt_state0,
            jnp.zeros((), dtype))


def single_loop_learn(utrue, f, x0, model: DenoiseModel, *,
                      outer: int = 300, n_inner: int = 40, n_adj: int = 10,
                      lr: float = 0.05, gamma: float = 1e4,
                      tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                      beta1: float = 0.9, beta2: float = 0.999,
                      eps: float = 1e-8, mesh=None,
                      optimizer=None, log_every: Optional[int] = None,
                      segment_callback=None,
                      cg_variant: str = "classic") -> SingleLoopResult:
    """Single-loop bilevel learning for any model/parameterization.

    ``x0`` must be strictly positive (the parameter lives in log space).

    ``optimizer``: optional ``optax.GradientTransformation`` applied to
    log α in place of the built-in Adam (e.g. ``optax.adam(0.05)``
    reproduces the default; schedules/chains compose as usual).  The
    optimizer state lives in the on-device scan carry.  NOTE: the
    transformation is a jit STATIC argument hashed by identity — reuse the
    same optimizer instance across calls (building a fresh
    ``optax.adam(...)`` per call recompiles the whole scan).

    ``mesh``: optional 1-D :class:`jax.sharding.Mesh` — the image batch is
    sharded over it (shard_map) with the parameter replicated; the only
    collectives are the per-step ``psum`` of the K gradient maps and the
    cost.  Zero-padded images (uneven batches) contribute exactly nothing:
    their PDPS solution of f = 0 is 0 = ū, so their adjoint state and
    gradient maps are identically zero.
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    # normalize to a batched (O, M, N) stack — per-k gradient maps are
    # reduced over axis 0, which must be the batch axis
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x0 = jnp.asarray(x0, utrue.dtype)
    _check_positive_x0(x0)
    pop, param_shape = _param_layout(model, x0, f.shape[-2:])
    kw = dict(model=model, outer=int(outer), n_inner=int(n_inner),
              n_adj=int(n_adj), pop=pop, param_shape=param_shape, lr=lr,
              gamma=gamma, tau0=tau0, sigma0=sigma0, beta1=beta1,
              beta2=beta2, eps=eps, optimizer=optimizer,
              cg_variant=str(cg_variant))
    make_carry0 = functools.partial(_init_carry, x0=x0, K=model.K,
                                    param_shape=param_shape,
                                    optimizer=optimizer)

    def carry_spec_fn(carry, b, r):
        u, ys, p, z, opt_state, t = carry
        return (b, jax.tree.map(lambda _: b, ys), b, r,
                jax.tree.map(lambda _: r, opt_state), r)

    res = drive_single_loop(_single_loop_impl, utrue, f, x0, kw,
                            make_carry0=make_carry0,
                            carry_spec_fn=carry_spec_fn, mesh=mesh,
                            log_every=log_every,
                            segment_callback=segment_callback)
    if squeeze:
        res = res._replace(u=res.u[0])
    return res


def drive_single_loop(impl, utrue, f, x0, kw, *, make_carry0,
                      carry_spec_fn, mesh=None, log_every=None,
                      segment_callback=None) -> SingleLoopResult:
    """Shared host driver for every single-loop family (TV/sumregs here,
    TGV/VTV/TVL1 in their sibling modules).

    ``impl``: a jitted scan body wrapper with the common contract
    ``impl(utrue, f, x0, *, carry0, return_carry, axis_name, **kw) ->
    SingleLoopResult [, carry]`` emitting ``(α, cost, ‖g‖)`` trajectories.
    ``make_carry0(f_like)``: initial scan carry (called with the PADDED
    global stack under a mesh).  ``carry_spec_fn(carry, b, r)``: shard_map
    PartitionSpec pytree for the carry (batch-state ``b``, parameter state
    ``r``).

    ``log_every=None`` → the whole loop is ONE device program (zero host
    hops).  ``log_every=j`` → chunked dispatch, one program per ``j`` outer
    steps: restores real per-segment wall-clock — the same observability
    trade the fused trust region makes (``tr_core.run_segmented``) — at
    ~1/j of the latency saving.  Executables are AOT-compiled before the
    clock starts, so ``times`` is pure execution; ``times[i]`` is the
    segment-end cumulative wall covering iteration ``i`` (no invented
    sub-segment precision)."""
    import time

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import BATCH_AXIS, pad_batch

        O = utrue.shape[0]
        utrue_p, _ = pad_batch(utrue, mesh.shape[BATCH_AXIS])
        f_p, _ = pad_batch(f, mesh.shape[BATCH_AXIS])
        b, r = P(BATCH_AXIS), P()
        res_spec = SingleLoopResult(alpha=r, u=b, cost=r,
                                    alpha_trajectory=r, cost_trajectory=r,
                                    gnorm_trajectory=r, times=None)

    if log_every is None:
        if mesh is None:
            return impl(utrue, f, x0, **kw)
        fn = shard_map(
            lambda ut, ff: impl(ut, ff, x0, axis_name=BATCH_AXIS, **kw),
            mesh=mesh, in_specs=(b, b), out_specs=res_spec)
        res = jax.jit(fn)(utrue_p, f_p)
        return res._replace(u=res.u[:O])

    log_every = int(log_every)
    outer = kw["outer"]
    if mesh is not None:
        carry = make_carry0(f_p)        # global padded shapes
        cspec = carry_spec_fn(carry, b, r)

        def make_runner(seg: int):
            kws = dict(kw, outer=seg)
            fn = shard_map(
                lambda ut, ff, c: impl(ut, ff, x0, carry0=c,
                                       return_carry=True,
                                       axis_name=BATCH_AXIS, **kws),
                mesh=mesh, in_specs=(b, b, cspec),
                out_specs=(res_spec, cspec))
            jf = jax.jit(fn)
            return lambda c: jf(utrue_p, f_p, c), (
                lambda c: jf.lower(utrue_p, f_p, c).compile())
    else:
        O = None
        carry = make_carry0(f)

        def make_runner(seg: int):
            kws = dict(kw, outer=seg)
            run = lambda c: impl(utrue, f, x0, carry0=c,
                                 return_carry=True, **kws)
            return run, (lambda c: impl.lower(
                utrue, f, x0, carry0=c, return_carry=True,
                **kws).compile())

    seg_lengths = sorted({min(log_every, outer), outer % log_every} - {0},
                         reverse=True)
    runners = {}
    for seg in seg_lengths:
        run, compile_fn = make_runner(seg)
        compile_fn(carry)          # AOT: JIT excluded from the clock
        runners[seg] = run

    times = np.zeros((outer,), np.float64)
    pieces = []
    done = 0
    t0 = time.perf_counter()
    while done < outer:
        seg = min(log_every, outer - done)
        res_seg, carry = runners[seg](carry)
        jax.block_until_ready(carry)
        elapsed = time.perf_counter() - t0
        times[done:done + seg] = elapsed
        pieces.append(res_seg)
        done += seg
        if segment_callback is not None:
            segment_callback(done, elapsed)
    res = pieces[-1]._replace(
        alpha_trajectory=jnp.concatenate(
            [p.alpha_trajectory for p in pieces]),
        cost_trajectory=jnp.concatenate(
            [p.cost_trajectory for p in pieces]),
        gnorm_trajectory=jnp.concatenate(
            [p.gnorm_trajectory for p in pieces]),
        times=times)
    if O is not None:
        res = res._replace(u=res.u[:O])
    return res


_TV = tv_model()


def single_loop_tv_learn(utrue, f, alpha0=0.1, **kwargs) -> SingleLoopResult:
    """Scalar/patch TV convenience wrapper."""
    return single_loop_learn(utrue, f, alpha0, _TV, **kwargs)


def single_loop_sumregs_learn(utrue, f, alpha0, **kwargs) -> SingleLoopResult:
    """Sum-of-regularizers convenience wrapper ((3,) or (m, n, 3) α)."""
    return single_loop_learn(utrue, f, alpha0, sumregs_model(), **kwargs)
