"""Fully on-device trust-region TGV² bilevel learning — ONE XLA computation.

The TGV analogue of :mod:`.fused`: the entire outer loop (dogleg-in-box
step from :mod:`.tr_core`, joint-primal Chambolle–Pock inner solve,
implicit-function-theorem hypergradient, BFGS/L-BFGS update, radius
schedule, acceptance) is traced into a single ``lax.while_loop`` under one
``jit`` — one dispatch, one device→host transfer at the end.  Same TR
semantics as the host path driving :func:`..learning.tgv.tgv_learning_function`
through ``bilevel_learn`` (and thereby the reference loop,
``src/TRBox.jl:192-273``), with the fused path's warm-start discipline:

* the joint solver state (u, w, p, q) is carried ACROSS trust-region
  evaluations (``inner_tol`` early stop) — evaluations at nearby (α₁, α₀)
  converge in a few hundred PDPS iterations instead of the cold budget;
* the adjoint CG multiplier λ (3 stacked planes) is likewise chained —
  consecutive smoothed joint systems differ only by a small perturbation,
  so the warm-started CG converges in a fraction of the cold iterations.
  (The IFT gradient is evaluated AT the returned solution, so neither warm
  start can bias it.)

There is no exact/regularized switch: the γ-Huber-smoothed implicit
gradient is the only branch (cf. ``src/TVLearningFunctionVec.jl:137-161``),
so the radius is ignored by the evaluation.

``backend="pallas"`` runs the forward solve in the fused VMEM-resident
TGV kernel (:mod:`..solvers.tgv_pallas`) for scalar AND spatially-varying
(patch-upsampled map) weights.  ``mesh=`` shards the image
batch (shard_map + psum on cost/gradient) — the replicated trust-region
logic is identical on every device and multi-chip training is still one
dispatch.  ``log_every=j`` drives the loop in j-iteration segments with a
host hop between them (per-segment wall-clock logging).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .first_order import _check_positive_x0
from .first_order_tgv import tgv_param_layout
from .fused import FusedResult
from .tr_core import make_tr_machinery, run_segmented, splice_dense_B
from ..solvers.tgv import _tgv_impl, tgv_implicit_cotangents

__all__ = ["bilevel_learn_tgv_fused"]

_STATIC = ("pop", "param_shape", "maxiter", "inner_maxiter", "inner_tol",
           "check_every", "gamma", "cg_tol", "cg_maxiter", "tau0", "sigma0",
           "backend", "interpret", "axis_name", "lbfgs_threshold",
           "lbfgs_memory")


def _machinery(utrue, f, *, pop, param_shape: tuple, maxiter: int, tol,
               eta1, eta2, beta1, beta2, inner_maxiter: int, inner_tol,
               check_every: int, gamma: float, cg_tol: float,
               cg_maxiter: int, tau0: float, sigma0: float, backend: str,
               interpret: bool, axis_name, lbfgs_threshold: int,
               lbfgs_memory: int):
    dtype = f.dtype
    n = int(np.prod(param_shape, dtype=int))
    use_pallas = backend == "pallas"

    def alphas_of(xflat):
        x = xflat.reshape(param_shape)
        if pop is None:
            return x[0], x[1]
        return pop.apply(x[..., 0]), pop.apply(x[..., 1])

    def solve(a1, a0, s0):
        if use_pallas:
            from ..solvers.tgv_pallas import tgv_denoise_pdps_pallas
            return tgv_denoise_pdps_pallas(
                f, a1, a0, tau0=tau0, sigma0=sigma0, maxiter=inner_maxiter,
                tol=inner_tol, check_every=check_every, state0=s0,
                return_state=True, interpret=interpret)
        u, w, state, _ = _tgv_impl(
            f, a1, a0, s0, tau0=tau0, sigma0=sigma0, maxiter=inner_maxiter,
            tol=inner_tol, check_every=check_every, return_state=True)
        return u, w, state

    def pullback(g1, g0):
        """Per-weight cotangents (scalars, or batch-summed (M, N) maps) →
        flat parameter gradient; under data parallelism the reductions
        psum over the mesh before the patch-grid pullback."""
        if axis_name is not None:
            g1 = lax.psum(g1, axis_name)
            g0 = lax.psum(g0, axis_name)
        if pop is None:
            return jnp.stack([g1, g0]).reshape(-1)
        return jnp.stack([pop.apply_adjoint(g1), pop.apply_adjoint(g0)],
                         axis=-1).reshape(-1)

    def eval_lf(xflat, delta, st):
        del delta   # smoothed implicit gradient: no exact/reg switch
        s0, lam0 = (None, None) if st is None else st
        a1, a0 = alphas_of(xflat)
        # parity mode (inner_tol None = fixed budget) cold-starts every
        # solve AND every adjoint CG, exactly like the host learning fn
        warm = inner_tol is not None
        u, w, state = solve(a1, a0, s0 if warm else None)
        cost = 0.5 * jnp.sum((u - utrue) ** 2)
        if axis_name is not None:
            cost = lax.psum(cost, axis_name)
        _, (g1, g0), lam, info = tgv_implicit_cotangents(
            u, w, (a1, a0), u - utrue, gamma=gamma, cg_tol=cg_tol,
            cg_maxiter=cg_maxiter, lam0=lam0 if warm else None,
            return_lam=True, return_info=True)
        cg = (jnp.max(info.iters).astype(dtype),
              jnp.all(info.converged).astype(dtype))
        return u, cost, pullback(g1, g0), (state, lam), cg

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


def bilevel_learn_tgv_fused(ds, *, xinit, params,
                            inner_maxiter: int = 5000,
                            inner_tol: float | None = None,
                            check_every: int = 500, gamma: float = 1e-4,
                            cg_tol: float = 1e-6, cg_maxiter: int = 1000,
                            tau0: float = 0.99, sigma0: float = 0.99,
                            backend: str = "pallas", mesh=None,
                            interpret: bool = False,
                            log_every: int | None = None,
                            segment_callback=None,
                            init_B=None) -> FusedResult:
    """Run the full TGV² trust-region bilevel learning as one device program.

    Args:
      ds: ``(true_images, noisy_images)`` stacks, (O, M, N) or (M, N).
      xinit: length-2 ``[α₁, α₀]`` weight vector or an (m, n, 2) stack of
        patch grids (spatially-varying weights).
      params: same TR knobs as :func:`bilevel_learn` (eta1/eta2/beta1/
        beta2, delta0, maxiter, tol, lbfgs_threshold, lbfgs_memory).
      inner_tol: joint-CP early-stop tolerance; ``None`` runs the fixed
        budget every evaluation (identical semantics to the host path —
        also disables the solver/adjoint warm-start chaining).
      gamma / cg_tol / cg_maxiter: implicit-gradient knobs
        (:func:`..solvers.tgv.tgv_implicit_cotangents`).
      backend: "pallas" (fused TGV kernel, scalar or map weights) or
        "jnp".
      mesh / log_every / segment_callback / init_B: as in
        :func:`.fused.bilevel_learn_fused` (carry layout
        ``(it, x_flat, Bst, delta, fx, gx, u, (state, lam), log)``).

    Returns a :class:`FusedResult`.
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    if f.ndim == 2:
        utrue, f = utrue[None], f[None]
    x0 = jnp.asarray(xinit, f.dtype)
    pop = tgv_param_layout(x0, f.shape[-2:])
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
