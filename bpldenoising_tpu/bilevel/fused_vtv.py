"""Fully on-device trust-region VTV (color) bilevel learning — ONE dispatch.

The vectorial-TV instantiation of the generic problem-pluggable TR core
(:mod:`.tr_core`; the TGV analogue lives in :mod:`.fused_tgv`): the entire
outer loop (dogleg-in-box step, channel-coupled PDPS inner solve on planar
``(O, C, M, N)`` color stacks, γ-Huber implicit hypergradient, BFGS/L-BFGS
update, radius schedule, acceptance) is traced into a single
``lax.while_loop`` under one ``jit``.  Same TR semantics as the host path
driving :func:`..learning.vtv.vtv_learning_function` through
``bilevel_learn`` (and thereby the reference loop, ``src/TRBox.jl:192-273``),
with the fused warm-start discipline: the (u, duals) solver state and the
adjoint CG multiplier λ are chained across evaluations when ``inner_tol``
enables early stopping (the IFT gradient is evaluated AT the returned
solution, so neither warm start can bias it).

``backend="pallas"`` runs the forward solve in the fused channel-coupled
kernel (:mod:`..solvers.vtv_pallas`) for scalar and (M, N)-map weights.
``mesh=`` shards the image batch (channels stay local — the Frobenius
coupling is per-pixel); ``log_every=j`` drives the loop in j-iteration
segments with host hops (per-segment wall-clock logging, checkpointing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models import vtv_model
from ..ops import PatchOp
from ..solvers.vtv import vtv_implicit_cotangents
from .first_order import _check_positive_x0
from .fused import FusedResult
from .tr_core import make_tr_machinery, run_segmented, splice_dense_B

__all__ = ["bilevel_learn_vtv_fused", "vtv_param_layout"]

_VTV = vtv_model()

_STATIC = ("pop", "param_shape", "maxiter", "inner_maxiter", "inner_tol",
           "check_every", "gamma", "cg_tol", "cg_maxiter", "tau0", "sigma0",
           "backend", "interpret", "axis_name", "lbfgs_threshold",
           "lbfgs_memory")


def vtv_param_layout(x0, image_shape):
    """Scalar weight → None; (m, n) patch grid → its PatchOp.  Shared by
    every VTV entry point so the parameterization rule cannot drift."""
    if x0.ndim == 0:
        return None
    if x0.ndim == 2 and tuple(x0.shape) == tuple(image_shape):
        return None                    # full-resolution map
    if x0.ndim == 2:
        return PatchOp(tuple(x0.shape), tuple(image_shape))
    raise ValueError(f"VTV parameter must be a scalar, an (M, N) map or an "
                     f"(m, n) patch grid, got shape {x0.shape}")


def _machinery(utrue, f, *, pop, param_shape: tuple, maxiter: int, tol,
               eta1, eta2, beta1, beta2, inner_maxiter: int, inner_tol,
               check_every: int, gamma: float, cg_tol: float,
               cg_maxiter: int, tau0: float, sigma0: float, backend: str,
               interpret: bool, axis_name, lbfgs_threshold: int,
               lbfgs_memory: int):
    dtype = f.dtype
    n = int(np.prod(param_shape, dtype=int))
    use_pallas = backend == "pallas"

    def alpha_of(xflat):
        x = xflat.reshape(param_shape)
        return pop.apply(x) if pop is not None else x

    def solve(a, s0):
        if use_pallas:
            from ..solvers.vtv_pallas import vtv_denoise_pdps_pallas
            return vtv_denoise_pdps_pallas(
                f, a, tau0=tau0, sigma0=sigma0, maxiter=inner_maxiter,
                tol=inner_tol, check_every=check_every, state0=s0,
                return_state=True, interpret=interpret)
        from ..solvers.pdps import _denoise_pdps_impl
        u, ys, _ = _denoise_pdps_impl(
            f, (a,), s0, model=_VTV, tau0=tau0, sigma0=sigma0, gamma=1.0,
            maxiter=inner_maxiter, accel=True, tol=inner_tol,
            check_every=check_every, return_dual=True)
        return u, (u, ys)

    def pullback(da):
        """Weight cotangent (scalar, or batch-summed (M, N) map) → flat
        parameter gradient; psum'd over the mesh under data parallelism
        BEFORE the patch pullback."""
        if axis_name is not None:
            da = lax.psum(da, axis_name)
        if pop is not None:
            da = pop.apply_adjoint(da)
        return jnp.reshape(da, (-1,))[:n] if n > 0 else da

    def eval_lf(xflat, delta, st):
        del delta   # smoothed implicit gradient: no exact/reg switch
        s0, lam0 = (None, None) if st is None else st
        a = alpha_of(xflat)
        # parity discipline: inner_tol None = fixed budget, cold starts
        warm = inner_tol is not None
        u, state = solve(a, s0 if warm else None)
        cost = 0.5 * jnp.sum((u - utrue) ** 2)
        if axis_name is not None:
            cost = lax.psum(cost, axis_name)
        _, da, lam, info = vtv_implicit_cotangents(
            u, a, u - utrue, gamma=gamma, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, lam0=lam0 if warm else None,
            return_lam=True, return_info=True)
        cg = (jnp.max(info.iters).astype(dtype),
              jnp.all(info.converged).astype(dtype))
        return u, cost, pullback(da), (state, lam), cg

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


def bilevel_learn_vtv_fused(ds, *, xinit, params,
                            inner_maxiter: int = 5000,
                            inner_tol: float | None = None,
                            check_every: int = 500, gamma: float = 1e-4,
                            cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                            tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                            backend: str = "pallas", mesh=None,
                            interpret: bool = False,
                            log_every: int | None = None,
                            segment_callback=None,
                            init_B=None) -> FusedResult:
    """Run the full VTV trust-region bilevel learning as one device program.

    Args:
      ds: ``(true_images, noisy_images)`` planar color stacks,
        (O, C, M, N) or (C, M, N).
      xinit: scalar coupling weight α or an (m, n) patch grid.
      params / inner_tol / gamma / cg knobs / backend / mesh / log_every /
        segment_callback / init_B: as in
        :func:`.fused_tgv.bilevel_learn_tgv_fused` (carry layout
        ``(it, x_flat, Bst, delta, fx, gx, u, (state, lam), log)``).

    Returns a :class:`FusedResult`.
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    if f.ndim == 3:
        utrue, f = utrue[None], f[None]
    if f.ndim != 4:
        raise ValueError(f"VTV expects (C, M, N) or (O, C, M, N) color "
                         f"stacks, got shape {f.shape}")
    x0 = jnp.asarray(xinit, f.dtype)
    pop = vtv_param_layout(x0, f.shape[-2:])
    _check_positive_x0(x0)
    kw = dict(
        pop=pop, param_shape=tuple(x0.shape),
        maxiter=int(params.maxiter), tol=float(params.get("tol", 0.0)),
        eta1=float(params.eta1), eta2=float(params.eta2),
        beta1=float(params.beta1), beta2=float(params.beta2),
        delta0=float(params.delta0), inner_maxiter=int(inner_maxiter),
        inner_tol=None if inner_tol is None else float(inner_tol),
        check_every=int(check_every), gamma=float(gamma),
        cg_tol=float(cg_tol), cg_maxiter=int(cg_maxiter), tau0=float(tau0),
        sigma0=float(sigma0), backend=backend, interpret=bool(interpret),
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
