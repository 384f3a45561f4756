"""Data-parallel (multi-chip) learning functions via ``shard_map``.

SPMD layout (SURVEY.md §2c "TPU-native plan"): the image batch is sharded
over a 1-D mesh; every chip runs the identical fused PDPS inner solve and a
JOINT block-diagonal hypergradient solve on its local shard; the only
collectives are two ``psum``s (cost and hypergradient) riding ICI.  The
trust-region outer loop stays on the host and is oblivious to the sharding.

Round-2 upgrades (VERDICT round 1, items 5/7):

* the adjoint CG state ``p`` is threaded through the shard_map boundary and
  cached per gradient branch in the factory — multi-chip trust-region
  evaluations warm-start exactly like the single-chip factories;
* ``backend="pallas"`` runs the fused kernel per shard (pass
  ``interpret=True`` to exercise it on a virtual CPU mesh);
* the per-shard hypergradient is one joint solve over the local sub-batch
  (no vmap-of-while_loop lane masking).

Batch sizes that don't divide the mesh are zero-padded; padded images
contribute nothing: their PDPS solution of f = 0 is 0 = ū, so their adjoint
rhs, CG iterates and gradient maps are identically zero (the explicit
weights guard the cost only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import sumregs_model, tv_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig, exact_hypergrad, reg_hypergrad
from ..solvers.pdps import denoise_pdps
from .mesh import BATCH_AXIS, pad_batch

__all__ = ["make_sharded_tv_learning_function",
           "make_sharded_sumregs_learning_function",
           "make_sharded_tgv_learning_function"]


def _build(mesh: Mesh, model, alphas_of_x, grads_of_maps, want_maps: bool,
           maxiter: int, cfg: HypergradConfig, backend: str = "jnp",
           interpret: bool = False, telemetry_holder=None):
    """Common scaffolding for sharded learning functions.

    ``alphas_of_x(x, image_shape)``: parameter → K-tuple of per-image α
    (scalars or (M, N) maps, replicated on every chip).
    ``grads_of_maps(gsum, x)``: summed per-k gradient (scalars or maps) →
    gradient shaped like ``x``.
    ``telemetry_holder``: closure to receive adjoint-CG convergence stats
    (``utils/telemetry.py``; the mesh-worst iters/residual/converged).
    """
    b, r = P(BATCH_AXIS), P()
    n_shards = mesh.shape[BATCH_AXIS]

    def _local(utrue, f, w, p0, alphas, method):
        if backend == "pallas":
            from ..solvers.pdps_pallas import denoise_pdps_pallas
            u = denoise_pdps_pallas(f, alphas, model, maxiter=maxiter,
                                    interpret=interpret)
        else:
            u = denoise_pdps(f, alphas, model, maxiter=maxiter)
        wb = w[:, None, None]
        cost = jax.lax.psum(0.5 * jnp.sum(wb * (u - utrue) ** 2),
                            BATCH_AXIS)
        fn = exact_hypergrad if method == "exact" else reg_hypergrad
        # one joint block-diagonal solve over the local sub-batch,
        # warm-started from the previous evaluation's adjoint state
        gs, p, info = fn(u, utrue, alphas, model, cfg, want_maps, p0=p0)
        gsum = tuple(
            jax.lax.psum(jnp.sum(g, axis=0) if g.ndim == 3 else g,
                         BATCH_AXIS)
            for g in gs)
        # worst-case adjoint-CG telemetry over the mesh (pmax/pmin ride ICI)
        cg = (jax.lax.pmax(jnp.max(info.iters), BATCH_AXIS),
              jax.lax.pmax(jnp.max(info.resnorm), BATCH_AXIS),
              jax.lax.pmin(jnp.all(info.converged).astype(jnp.int32),
                           BATCH_AXIS))
        return u, cost, gsum, p, cg

    shard_fns = {}
    for method in ("exact", "reg"):
        # check_vma=False: pallas_call outputs carry no vma annotation, so
        # the varying-across-mesh checker cannot see through the kernel
        shard_fns[method] = jax.jit(shard_map(
            functools.partial(_local, method=method), mesh=mesh,
            in_specs=(b, b, b, b, r), out_specs=(b, r, r, b, (r, r, r)),
            check_vma=False))

    # bounded warm-start cache: each entry anchors the dataset object so a
    # recycled id() can never alias different data, and old entries evict
    from collections import OrderedDict
    p_state: OrderedDict = OrderedDict()
    MAX_ENTRIES = 8

    def learning_function(x, ds, delta, *, delta_t=1e-6):
        utrue = jnp.asarray(ds[0])
        f = jnp.asarray(ds[1], utrue.dtype)
        O = utrue.shape[0]
        utrue_p, w = pad_batch(utrue, n_shards)
        f_p, _ = pad_batch(f, n_shards)
        x = jnp.asarray(x, utrue.dtype)
        alphas = alphas_of_x(x, f.shape[-2:])
        method = "exact" if float(delta) > delta_t else "reg"
        anchor = ds[0]
        key = (method, utrue_p.shape, id(anchor))
        entry = p_state.get(key)
        p0 = (entry[0] if entry is not None and entry[1] is anchor
              else jnp.zeros_like(f_p))
        u, cost, gsum, p, cg = shard_fns[method](utrue_p, f_p, w, p0, alphas)
        p_state[key] = (p, anchor)
        p_state.move_to_end(key)
        while len(p_state) > MAX_ENTRIES:
            p_state.popitem(last=False)
        grad = grads_of_maps(gsum, x)
        if telemetry_holder is not None:
            from ..solvers.krylov import KrylovInfo
            from ..utils.telemetry import record_adjoint_cg
            record_adjoint_cg(telemetry_holder,
                              KrylovInfo(cg[0], cg[1], cg[2]))
        return u[:O], cost, grad

    return learning_function


def make_sharded_tv_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, delta_t: float = 1e-6,
        cfg: HypergradConfig = HypergradConfig(), backend: str = "jnp",
        interpret: bool = False):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.tv_learning_function` (same L4 contract,
    scalar or patch parameter)."""
    model = tv_model()
    state = {}

    def alphas_of_x(x, image_shape):
        if x.ndim == 0:
            state[tuple(image_shape)] = None
            return (x,)
        pop = PatchOp(tuple(x.shape), tuple(image_shape))
        state[tuple(image_shape)] = pop
        return (pop.apply(x),)

    def grads_of_maps(gsum, x, image_shape=None):
        (g,) = gsum
        if x.ndim == 0:
            return g
        return state[tuple(g.shape[-2:])].apply_adjoint(g)

    # build lazily per parameter shape (scalar vs patch grids) and cache
    cache = {}

    def cached(x, ds, delta):
        x = jnp.asarray(x)
        key = (x.ndim, tuple(x.shape))
        if key not in cache:
            cache[key] = _build(mesh, model, alphas_of_x, grads_of_maps,
                                want_maps=bool(x.ndim > 0), maxiter=maxiter,
                                cfg=cfg, backend=backend,
                                interpret=interpret,
                                telemetry_holder=cached)
        return cache[key](x, ds, delta, delta_t=delta_t)

    return cached


def make_sharded_sumregs_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, delta_t: float = 1e-3,
        cfg: HypergradConfig = HypergradConfig(), backend: str = "jnp",
        interpret: bool = False):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.sumregs_learning_function`."""
    model = sumregs_model()
    state = {}

    def alphas_of_x(x, image_shape):
        if x.ndim == 1:
            state[tuple(image_shape)] = None
            return tuple(x[k] for k in range(3))
        pop = PatchOp(tuple(x.shape[:2]), tuple(image_shape))
        state[tuple(image_shape)] = pop
        return tuple(pop.apply(x[..., k]) for k in range(3))

    def grads_of_maps(gsum, x):
        if x.ndim == 1:
            return jnp.stack(gsum)
        pop = state[tuple(gsum[0].shape[-2:])]
        return jnp.stack([pop.apply_adjoint(g) for g in gsum], axis=-1)

    cache = {}

    def cached(x, ds, delta):
        x = jnp.asarray(x)
        key = (x.ndim, tuple(x.shape))
        if key not in cache:
            cache[key] = _build(mesh, model, alphas_of_x, grads_of_maps,
                                want_maps=bool(x.ndim > 1), maxiter=maxiter,
                                cfg=cfg, backend=backend,
                                interpret=interpret,
                                telemetry_holder=cached)
        return cache[key](x, ds, delta, delta_t=delta_t)

    return cached


def make_sharded_tgv_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, gamma: float = 1e-4,
        cg_tol: float = 1e-6, cg_maxiter: int = 1000, backend: str = "jnp",
        interpret: bool = False):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.tgv_learning_function` (beyond-reference
    TGV² family): the batch shards over the mesh, every chip runs the fused
    (or jnp) TGV solve plus the implicit-CG vjp on its local sub-batch, and
    the cost/gradient ``psum`` over ICI.  Padded images solve to u = 0 = ū,
    so their loss cotangent — and hence their whole backward pass — is
    identically zero; only the cost needs the explicit weights."""
    from ..solvers.tgv import make_diff_tgv_denoise
    solve = make_diff_tgv_denoise(maxiter=maxiter, gamma=gamma,
                                  cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                                  backend=backend, interpret=interpret)
    b, r = P(BATCH_AXIS), P()
    n_shards = mesh.shape[BATCH_AXIS]

    def _local(x, utrue, f, w):
        def cost_fn(x_):
            u = solve(f, (x_[0], x_[1]))
            wb = w[:, None, None]
            return 0.5 * jnp.sum(wb * (u - utrue) ** 2), u

        (cost, u), grad = jax.value_and_grad(cost_fn, has_aux=True)(x)
        return (u, jax.lax.psum(cost, BATCH_AXIS),
                jax.lax.psum(grad, BATCH_AXIS))

    fn = jax.jit(shard_map(_local, mesh=mesh, in_specs=(r, b, b, b),
                           out_specs=(b, r, r), check_vma=False))

    def learning_function(x, ds, delta):
        del delta
        utrue = jnp.asarray(ds[0])
        f = jnp.asarray(ds[1], utrue.dtype)
        O = utrue.shape[0]
        utrue_p, w = pad_batch(utrue, n_shards)
        f_p, _ = pad_batch(f, n_shards)
        x = jnp.asarray(x, utrue.dtype)
        u, cost, grad = fn(x, utrue_p, f_p, w)
        return u[:O], cost, grad

    return learning_function


def make_sharded_vtv_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, gamma: float = 1e-4,
        cg_tol: float = 1e-6, cg_maxiter: int = 1000, backend: str = "jnp",
        interpret: bool = False):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.vtv_learning_function` (beyond-reference
    vectorial/color family): the (O, C, M, N) batch shards over the mesh on
    the IMAGE axis (channels stay local — the Frobenius coupling is
    per-pixel, so it never crosses chips), every chip runs the coupled
    solve + implicit-CG vjp on its local sub-batch, and cost/gradient
    ``psum`` over ICI.  Padded images solve to u = 0 = ū, so their whole
    backward pass is identically zero; only the cost needs the explicit
    weights.  The per-image CG dots (`cg_batched`) make the adjoint solve
    grouping-invariant, so the sharded trajectory equals single-device."""
    from ..solvers.vtv import make_diff_vtv_denoise
    solve = make_diff_vtv_denoise(maxiter=maxiter, gamma=gamma,
                                  cg_tol=cg_tol, cg_maxiter=cg_maxiter,
                                  backend=backend, interpret=interpret)
    b, r = P(BATCH_AXIS), P()
    n_shards = mesh.shape[BATCH_AXIS]

    def _local(x, utrue, f, w):
        def cost_fn(x_):
            u = solve(f, x_)
            wb = w[:, None, None, None]
            return 0.5 * jnp.sum(wb * (u - utrue) ** 2), u

        (cost, u), grad = jax.value_and_grad(cost_fn, has_aux=True)(x)
        return (u, jax.lax.psum(cost, BATCH_AXIS),
                jax.lax.psum(grad, BATCH_AXIS))

    fn = jax.jit(shard_map(_local, mesh=mesh, in_specs=(r, b, b, b),
                           out_specs=(b, r, r), check_vma=False))

    def learning_function(x, ds, delta):
        del delta
        utrue = jnp.asarray(ds[0])
        f = jnp.asarray(ds[1], utrue.dtype)
        O = utrue.shape[0]
        utrue_p, w = pad_batch(utrue, n_shards)
        f_p, _ = pad_batch(f, n_shards)
        x = jnp.asarray(x, utrue.dtype)
        u, cost, grad = fn(x, utrue_p, f_p, w)
        return u[:O], cost, grad

    return learning_function


def make_sharded_tvl1_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, gamma_d: float = 100.0,
        gamma: float = 1000.0, cg_tol: float | None = None,
        cg_maxiter: int = 2000):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.tvl1_learning_function`
    (beyond-reference impulse-noise family): the batch shards over the
    mesh, every chip runs the Huber-smoothed TV-L1 solve plus the
    implicit-CG vjp on its local sub-batch, and the cost/gradient
    ``psum`` over ICI.  Padded images have f = 0 so they solve to
    u = 0 = ū exactly (the L1 prox pins u = f at α·0 dual) — their loss
    cotangent, and hence their whole backward pass, is identically zero;
    only the cost needs the explicit weights.  The per-image CG dots in
    :func:`..solvers.tvl1_huber.tvl1_huber_implicit_cotangents` make the
    adjoint solve grouping-invariant, so the sharded trajectory equals
    single-device.  Patch grids are upsampled OUTSIDE the shard_map (the
    (M, N) weight map is replicated) and the gradient is pulled back
    through the PatchOp adjoint on the host side."""
    from ..solvers.tvl1_huber import make_diff_tvl1_denoise
    solve = make_diff_tvl1_denoise(maxiter=maxiter, gamma_d=gamma_d,
                                   gamma=gamma, cg_tol=cg_tol,
                                   cg_maxiter=cg_maxiter)
    b, r = P(BATCH_AXIS), P()
    n_shards = mesh.shape[BATCH_AXIS]

    def _local(alpha, utrue, f, w):
        def cost_fn(a_):
            u = solve(f, a_)
            wb = w[:, None, None]
            return 0.5 * jnp.sum(wb * (u - utrue) ** 2), u

        (cost, u), grad = jax.value_and_grad(cost_fn, has_aux=True)(alpha)
        return (u, jax.lax.psum(cost, BATCH_AXIS),
                jax.lax.psum(grad, BATCH_AXIS))

    fn = jax.jit(shard_map(_local, mesh=mesh, in_specs=(r, b, b, b),
                           out_specs=(b, r, r), check_vma=False))

    def learning_function(x, ds, delta):
        del delta
        utrue = jnp.asarray(ds[0])
        f = jnp.asarray(ds[1], utrue.dtype)
        O = utrue.shape[0]
        utrue_p, w = pad_batch(utrue, n_shards)
        f_p, _ = pad_batch(f, n_shards)
        x = jnp.asarray(x, utrue.dtype)
        pop = None
        if x.ndim == 2 and x.shape != tuple(f.shape[-2:]):
            from ..ops import PatchOp
            pop = PatchOp(tuple(x.shape), tuple(f.shape[-2:]))
        alpha = pop.apply(x) if pop is not None else x
        u, cost, grad = fn(alpha, utrue_p, f_p, w)
        if pop is not None:
            grad = pop.apply_adjoint(grad)
        return u[:O], cost, grad

    return learning_function
