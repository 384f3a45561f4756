"""Fully on-device trust-region TV-L1 bilevel learning — ONE dispatch.

The TV-L1 instantiation of the generic problem-pluggable TR core
(:mod:`.tr_core`; TGV/VTV analogues in :mod:`.fused_tgv` /
:mod:`.fused_vtv`): the entire outer loop (dogleg-in-box step,
Huber-smoothed TV-L1 primal–dual inner solve, implicit-differentiation
hypergradient, BFGS/L-BFGS update, radius schedule, acceptance) is traced
into a single ``lax.while_loop`` under one ``jit``.  Same TR semantics as
the host path driving :func:`..learning.tvl1.tvl1_learning_function`
through ``bilevel_learn`` (and thereby the reference loop,
``src/TRBox.jl:192-273``), with the fused warm-start discipline matching
the host factory exactly: the adjoint CG state p is chained across
evaluations ALWAYS (:func:`..learning.tvl1.make_tvl1_learning_function`),
the (u, y) inner-solver state only when ``inner_tol`` enables early
stopping.  The hypergradient is evaluated by the SAME
:func:`..solvers.tvl1_huber.tvl1_huber_hypergrad` the host path calls, so
parity mode (``inner_tol=None``) is bit-exact against the host loop.

``backend="pallas"`` runs the forward solve in the fused VMEM-resident
Huber-smoothed kernel (:mod:`..solvers.tvl1_huber_pallas`) for scalar AND
patch-upsampled map weights.  ``mesh=`` shards the image batch — the
smoothed adjoint system is block-diagonal across images, so the per-shard
CG solve is exact and only the cost and gradient reductions psum.
``log_every=j`` drives the loop in j-iteration segments with host hops
(per-segment wall-clock logging, checkpointing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models import tv_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig
from ..solvers.tvl1_huber import _tvl1_huber_impl, tvl1_huber_hypergrad
from .first_order import _check_positive_x0
from .fused import FusedResult
from .tr_core import make_tr_machinery, run_segmented, splice_dense_B

__all__ = ["bilevel_learn_tvl1_fused", "tvl1_param_layout"]

_TV = tv_model()

_STATIC = ("pop", "param_shape", "maxiter", "inner_maxiter", "inner_tol",
           "check_every", "gamma_d", "cfg", "tau0", "sigma0", "backend",
           "interpret", "axis_name", "lbfgs_threshold", "lbfgs_memory")


def tvl1_param_layout(x0, image_shape):
    """Scalar weight → None; any (m, n) grid → its PatchOp (the host
    learning function wraps even full-resolution maps in a PatchOp,
    :func:`..learning.tvl1.tvl1_learning_function` — keep identical)."""
    if x0.ndim == 0:
        return None
    if x0.ndim == 2:
        return PatchOp(tuple(x0.shape), tuple(image_shape))
    raise ValueError(f"TV-L1 parameter must be a scalar or an (m, n) patch "
                     f"grid, got shape {x0.shape}")


def _machinery(utrue, f, *, pop, param_shape: tuple, maxiter: int, tol,
               eta1, eta2, beta1, beta2, inner_maxiter: int, inner_tol,
               check_every: int, gamma_d: float, cfg: HypergradConfig,
               tau0: float, sigma0: float, backend: str, interpret: bool,
               axis_name, lbfgs_threshold: int, lbfgs_memory: int):
    dtype = f.dtype
    n = int(np.prod(param_shape, dtype=int))
    use_pallas = backend == "pallas"
    L = float(_TV.opnorm_sq()) ** 0.5
    want_maps = pop is not None

    def alpha_of(xflat):
        x = xflat.reshape(param_shape)
        return pop.apply(x) if pop is not None else x

    def solve(a, s0):
        if use_pallas:
            from ..solvers.tvl1_huber_pallas import tvl1_huber_pallas_impl
            return tvl1_huber_pallas_impl(
                f, a, s0, gamma_d=gamma_d, gamma_r=cfg.gamma,
                tau=tau0 / L, sigma=sigma0 / L, maxiter=inner_maxiter,
                tol=inner_tol, check_every=check_every,
                interpret=interpret)
        return _tvl1_huber_impl(
            f, a, s0, gamma_d=gamma_d, gamma_r=cfg.gamma, tau=tau0 / L,
            sigma=sigma0 / L, maxiter=inner_maxiter, tol=inner_tol,
            check_every=check_every, return_dual=True)

    def pullback(g):
        """Hypergradient (scalar, or per-image (O, M, N) maps) → flat
        parameter gradient; batch reductions psum over the mesh BEFORE
        the patch-grid pullback (cf. :mod:`.fused`)."""
        if want_maps:
            g = jnp.sum(g, axis=0)
        if axis_name is not None:
            g = lax.psum(g, axis_name)
        if pop is not None:
            g = pop.apply_adjoint(g)
        return jnp.reshape(g, (-1,))

    def eval_lf(xflat, delta, st):
        del delta   # smoothed implicit gradient: no exact/reg switch
        if st is None:
            s0, p0 = None, jnp.zeros_like(f)
        else:
            s0, p0 = st
        a = alpha_of(xflat)
        # host-factory discipline: inner state warm only with early stop;
        # adjoint CG state chained ALWAYS (learning/tvl1.py docstring)
        warm = inner_tol is not None
        u, state = solve(a, s0 if warm else None)
        cost = 0.5 * jnp.sum((u - utrue) ** 2)
        if axis_name is not None:
            cost = lax.psum(cost, axis_name)
        grads, p, info = tvl1_huber_hypergrad(
            u, f, utrue, (a,), _TV, cfg, want_maps, p0=p0, gamma_d=gamma_d)
        cg = (jnp.max(info.iters).astype(dtype),
              jnp.all(info.converged).astype(dtype))
        return u, cost, pullback(grads[0]), (state, p), cg

    return make_tr_machinery(
        eval_lf, n=n, dtype=dtype, maxiter=maxiter, tol=tol, eta1=eta1,
        eta2=eta2, beta1=beta1, beta2=beta2,
        lbfgs_threshold=lbfgs_threshold, lbfgs_memory=lbfgs_memory)


def _finalize(carry, param_shape) -> FusedResult:
    it, x, _, _, fx, gx, u, _, log = carry
    return FusedResult(x=x.reshape(param_shape), u=u, cost=fx,
                       g_norm=jnp.linalg.norm(gx), iterations=it, log=log)


@functools.partial(jax.jit, static_argnames=_STATIC)
def _impl(utrue, f, x0, *, tol, eta1, eta2, beta1, beta2, delta0,
          axis_name=None, **static_kw):
    init_carry, cond, body = _machinery(
        utrue, f, tol=tol, eta1=eta1, eta2=eta2, beta1=beta1, beta2=beta2,
        axis_name=axis_name, **static_kw)
    carry = lax.while_loop(cond, body, init_carry(x0, delta0))
    return _finalize(carry, static_kw["param_shape"])


@functools.partial(jax.jit, static_argnames=_STATIC)
def _init_impl(utrue, f, x0, *, tol, eta1, eta2, beta1, beta2, delta0,
               axis_name=None, **static_kw):
    init_carry, _, _ = _machinery(
        utrue, f, tol=tol, eta1=eta1, eta2=eta2, beta1=beta1, beta2=beta2,
        axis_name=axis_name, **static_kw)
    return init_carry(x0, delta0)


@functools.partial(jax.jit, static_argnames=_STATIC + ("seg",),
                   donate_argnums=(2,))
def _segment_impl(utrue, f, carry, *, seg: int, tol, eta1, eta2, beta1,
                  beta2, delta0, axis_name=None, **static_kw):
    del delta0  # lives in the carry after init
    _, cond, body = _machinery(
        utrue, f, tol=tol, eta1=eta1, eta2=eta2, beta1=beta1, beta2=beta2,
        axis_name=axis_name, **static_kw)
    it_end = carry[0] + jnp.asarray(int(seg), jnp.int32)

    def cond_seg(c):
        return jnp.logical_and(cond(c), c[0] < it_end)

    return lax.while_loop(cond_seg, body, carry)


def bilevel_learn_tvl1_fused(ds, *, xinit, params,
                             inner_maxiter: int = 5000,
                             inner_tol: float | None = None,
                             check_every: int = 500,
                             gamma_d: float = 100.0,
                             gamma: float = 1000.0,
                             cg_tol=None, cg_maxiter: int = 2000,
                             tau0: float = 0.99, sigma0: float = 0.99,
                             backend: str = "pallas", mesh=None,
                             interpret: bool = False,
                             log_every: int | None = None,
                             segment_callback=None,
                             init_B=None) -> FusedResult:
    """Run the full TV-L1 trust-region bilevel learning as one device
    program (Huber-smoothed surrogate; the impulse-noise analogue of
    :func:`.fused.bilevel_learn_fused`).

    Args:
      ds: ``(true_images, noisy_images)`` stacks, (O, M, N) or (M, N).
      xinit: scalar weight α or an (m, n) patch grid.
      params: same TR knobs as :func:`bilevel_learn` (eta1/eta2/beta1/
        beta2, delta0, maxiter, tol, lbfgs_threshold, lbfgs_memory).
      inner_tol: PD early-stop tolerance; ``None`` runs the fixed budget
        every evaluation — bit-exact against the host path (which also
        cold-starts the solver but chains the adjoint CG).
      gamma_d / gamma: data / regularizer Huber slopes
        (:mod:`..solvers.tvl1_huber` convention; defaults match
        ``tvl1_bilevel_params``).
      cg_tol / cg_maxiter: adjoint-CG knobs (``cg_tol=None`` picks the
        dtype default, same as the host learning function).
      backend / mesh / log_every / segment_callback / init_B: as in
        :func:`.fused_vtv.bilevel_learn_vtv_fused` (carry layout
        ``(it, x_flat, Bst, delta, fx, gx, u, (state, p), log)``).

    Returns a :class:`FusedResult`.
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    if f.ndim == 2:
        utrue, f = utrue[None], f[None]
    x0 = jnp.asarray(xinit, f.dtype)
    pop = tvl1_param_layout(x0, f.shape[-2:])
    _check_positive_x0(x0)
    cfg = HypergradConfig(gamma=float(gamma), cg_tol=cg_tol,
                          cg_maxiter=int(cg_maxiter))
    kw = dict(
        pop=pop, param_shape=tuple(x0.shape),
        maxiter=int(params.maxiter), tol=float(params.get("tol", 0.0)),
        eta1=float(params.eta1), eta2=float(params.eta2),
        beta1=float(params.beta1), beta2=float(params.beta2),
        delta0=float(params.delta0), inner_maxiter=int(inner_maxiter),
        inner_tol=None if inner_tol is None else float(inner_tol),
        check_every=int(check_every), gamma_d=float(gamma_d), cfg=cfg,
        tau0=float(tau0), sigma0=float(sigma0), backend=backend,
        interpret=bool(interpret),
        lbfgs_threshold=int(params.get("lbfgs_threshold", 64)),
        lbfgs_memory=int(params.get("lbfgs_memory", 10)))
    if log_every is not None:
        if mesh is not None:
            raise ValueError("log_every (chunked dispatch) does not "
                             "compose with mesh= data parallelism; drive "
                             "segments from the host or drop log_every")

        def post_init(carry):
            return splice_dense_B(carry, init_B, f.dtype)

        carry, times = run_segmented(
            lambda: _init_impl(utrue, f, x0, **kw),
            lambda c: _segment_impl(utrue, f, c, seg=int(log_every), **kw),
            maxiter=kw["maxiter"], tol=kw["tol"],
            log_every=int(log_every), segment_callback=segment_callback,
            post_init=post_init)
        res = _finalize(carry, kw["param_shape"])
        return res._replace(times=times[:int(res.iterations)])
    if mesh is None:
        return _impl(utrue, f, x0, **kw)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import BATCH_AXIS, pad_batch

    O = utrue.shape[0]
    n_shards = mesh.shape[BATCH_AXIS]
    utrue_p, _ = pad_batch(utrue, n_shards)
    f_p, _ = pad_batch(f, n_shards)
    b, r = P(BATCH_AXIS), P()
    out_specs = FusedResult(x=r, u=b, cost=r, g_norm=r, iterations=r,
                            log=r, times=None)
    fn = shard_map(
        lambda ut, ff: _impl(ut, ff, x0, axis_name=BATCH_AXIS, **kw),
        mesh=mesh, in_specs=(b, b), out_specs=out_specs, check_vma=False)
    res = jax.jit(fn)(utrue_p, f_p)
    return res._replace(u=res.u[:O])
