"""Data-parallel (multi-chip) learning functions via ``shard_map``.

SPMD layout (SURVEY.md §2c "TPU-native plan"): the image batch is sharded
over a 1-D mesh; every chip runs the identical fused PDPS inner solve and
per-image hypergradient on its local shard; the only collectives are two
``psum``s (cost and hypergradient) riding ICI.  The trust-region outer loop
stays on the host and is oblivious to the sharding.

Batch sizes that don't divide the mesh are zero-padded with per-image
weights so padded images contribute nothing to cost or gradient.
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
           "make_sharded_sumregs_learning_function"]


def _shard_specs(mesh):
    b = P(BATCH_AXIS)
    r = P()
    return b, r


def _build(mesh: Mesh, model, alphas_of_x, grads_of_maps, want_maps: bool,
           maxiter: int, cfg: HypergradConfig, backend: str = "jnp"):
    """Common scaffolding for sharded learning functions.

    ``alphas_of_x(x, image_shape)``: parameter → K-tuple of per-image α
    (scalars or (M, N) maps, replicated on every chip).
    ``grads_of_maps(gsum, x)``: summed per-k gradient (scalars or maps) →
    gradient shaped like ``x``.
    """
    b, r = _shard_specs(mesh)
    n_shards = mesh.shape[BATCH_AXIS]

    def _local(utrue, f, w, alphas, method):
        if backend == "pallas":
            from ..solvers.pdps_pallas import denoise_pdps_pallas
            u = denoise_pdps_pallas(f, alphas, model, maxiter=maxiter)
        else:
            u = denoise_pdps(f, alphas, model, maxiter=maxiter)
        wb = w[:, None, None]
        cost_local = 0.5 * jnp.sum(wb * (u - utrue) ** 2)
        cost = jax.lax.psum(cost_local, BATCH_AXIS)
        fn = exact_hypergrad if method == "exact" else reg_hypergrad
        per_image = jax.vmap(
            lambda ui, ti: fn(ui, ti, alphas, model, cfg, want_maps)[0])
        gs = per_image(u, utrue)  # K-tuple of (O_local,) or (O_local, M, N)
        gsum = tuple(
            jax.lax.psum(
                jnp.sum(g * (w[:, None, None] if g.ndim == 3 else w), axis=0),
                BATCH_AXIS)
            for g in gs)
        return u, cost, gsum

    shard_fns = {}
    for method in ("exact", "reg"):
        shard_fns[method] = jax.jit(shard_map(
            functools.partial(_local, method=method), mesh=mesh,
            in_specs=(b, b, b, r), out_specs=(b, r, r)))

    def learning_function(x, ds, delta, *, delta_t=1e-6):
        utrue = jnp.asarray(ds[0])
        f = jnp.asarray(ds[1], utrue.dtype)
        O = utrue.shape[0]
        utrue_p, w = pad_batch(utrue, n_shards)
        f_p, _ = pad_batch(f, n_shards)
        x = jnp.asarray(x, utrue.dtype)
        alphas = alphas_of_x(x, f.shape[-2:])
        method = "exact" if float(delta) > delta_t else "reg"
        u, cost, gsum = shard_fns[method](utrue_p, f_p, w, alphas)
        grad = grads_of_maps(gsum, x)
        return u[:O], cost, grad

    return learning_function


def make_sharded_tv_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, delta_t: float = 1e-6,
        cfg: HypergradConfig = HypergradConfig(), backend: str = "jnp"):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.tv_learning_function` (same L4 contract,
    scalar or patch parameter)."""
    model = tv_model()
    state = {}

    def alphas_of_x(x, image_shape):
        if x.ndim == 0:
            state["pop"] = None
            return (x,)
        pop = PatchOp(tuple(x.shape), tuple(image_shape))
        state["pop"] = pop
        return (pop.apply(x),)

    def grads_of_maps(gsum, x):
        (g,) = gsum
        if x.ndim == 0:
            return g
        return state["pop"].apply_adjoint(g)

    # build lazily per parameter shape (scalar vs patch grids) and cache
    cache = {}

    def cached(x, ds, delta):
        x = jnp.asarray(x)
        key = (x.ndim, tuple(x.shape))
        if key not in cache:
            cache[key] = _build(mesh, model, alphas_of_x, grads_of_maps,
                                want_maps=bool(x.ndim > 0), maxiter=maxiter,
                                cfg=cfg, backend=backend)
        return cache[key](x, ds, delta, delta_t=delta_t)

    return cached


def make_sharded_sumregs_learning_function(
        mesh: Mesh, *, maxiter: int = 5000, delta_t: float = 1e-3,
        cfg: HypergradConfig = HypergradConfig(), backend: str = "jnp"):
    """Sharded equivalent of
    :func:`bpldenoising_tpu.learning.sumregs_learning_function`."""
    model = sumregs_model()
    state = {}

    def alphas_of_x(x, image_shape):
        if x.ndim == 1:
            state["pop"] = None
            return tuple(x[k] for k in range(3))
        pop = PatchOp(tuple(x.shape[:2]), tuple(image_shape))
        state["pop"] = pop
        return tuple(pop.apply(x[..., k]) for k in range(3))

    def grads_of_maps(gsum, x):
        if x.ndim == 1:
            return jnp.stack(gsum)
        pop = state["pop"]
        return jnp.stack([pop.apply_adjoint(g) for g in gsum], axis=-1)

    cache = {}

    def cached(x, ds, delta):
        x = jnp.asarray(x)
        key = (x.ndim, tuple(x.shape))
        if key not in cache:
            cache[key] = _build(mesh, model, alphas_of_x, grads_of_maps,
                                want_maps=bool(x.ndim > 1), maxiter=maxiter,
                                cfg=cfg, backend=backend)
        return cache[key](x, ds, delta, delta_t=delta_t)

    return cached
