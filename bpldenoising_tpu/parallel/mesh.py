"""Device mesh utilities for data-parallel bilevel learning.

The reference is single-process Julia with a sequential per-image gradient
loop (``src/TVLearningFunctionVec.jl:72-83``; SURVEY.md §2c: no distributed
machinery of any kind).  Here the image batch is the data-parallel axis:
shard it over a 1-D ``jax.sharding.Mesh`` and let ``psum`` over ICI
accumulate the upper-level cost and hypergradient across chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_batch_mesh", "make_batch_rows_mesh", "shard_batch",
           "pad_batch", "BATCH_AXIS"]

BATCH_AXIS = "batch"


def make_batch_mesh(n_devices: Optional[int] = None,
                    devices=None) -> Mesh:
    """1-D mesh over the image-batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def pad_batch(arr, n_shards: int):
    """Pad axis 0 to a multiple of ``n_shards``; returns (padded, weights)
    where ``weights`` is 1.0 for real elements and 0.0 for padding."""
    import jax.numpy as jnp
    arr = jnp.asarray(arr)
    O = arr.shape[0]
    target = -(-O // n_shards) * n_shards
    w = jnp.ones((O,), arr.dtype)
    if target == O:
        return arr, w
    pad = [(0, target - O)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad), jnp.pad(w, (0, target - O))


def shard_batch(arr, mesh: Mesh):
    """Place an (O, ...) array with its leading axis sharded over the mesh."""
    spec = P(BATCH_AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def make_batch_rows_mesh(n_batch: int, n_rows: int, devices=None) -> Mesh:
    """2-D mesh for composed data (batch) × spatial (rows) parallelism —
    see :func:`bpldenoising_tpu.parallel.halo.denoise_pdps_batch_row_sharded`."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_batch * n_rows])
    if devices.size != n_batch * n_rows:
        raise ValueError(
            f"need {n_batch * n_rows} devices, have {devices.size}")
    from .halo import ROWS_AXIS
    return Mesh(devices.reshape(n_batch, n_rows), (BATCH_AXIS, ROWS_AXIS))
