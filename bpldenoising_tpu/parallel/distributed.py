"""Multi-host (DCN) initialization.

The reference is single-process Julia with no distributed machinery
(SURVEY.md §2c; ``/root/reference/src/``).  Single-host multi-chip needs
nothing beyond the mesh helpers in :mod:`bpldenoising_tpu.parallel.mesh`.
For multi-host pods/slices, JAX requires ``jax.distributed.initialize()``
before first device use; after it, ``jax.devices()`` is the global device
list and the existing helpers (``make_batch_mesh``,
``make_batch_rows_mesh``) span hosts unchanged.

Placement guidance (DESIGN.md §10): put the **batch** axis across hosts —
data parallelism's two psum'd scalars plus one parameter-sized array per
evaluation tolerate DCN latency — and keep the **rows** (halo) axis inside
one ICI slice, since its per-iteration ``ppermute`` would serialize on DCN
round trips.
"""

from __future__ import annotations

import os

__all__ = ["initialize_distributed"]

# environment markers that indicate a multi-process launch; JAX's own
# auto-detection (TPU metadata, Slurm, OpenMPI) covers the rest once we
# decide to call initialize().  Address-style markers count by presence;
# count-style markers only count when the process/node count exceeds 1
# (a single-process `mpirun`/1-node Slurm job needs no coordinator).
_CLUSTER_ADDRESS_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)
_CLUSTER_COUNT_VARS = (
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def _cluster_env_present() -> bool:
    if any(os.environ.get(v) for v in _CLUSTER_ADDRESS_VARS):
        return True
    for v in _CLUSTER_COUNT_VARS:
        n = os.environ.get(v)
        if n and n.isdigit() and int(n) > 1:
            return True
    return False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host JAX when a cluster environment is present.

    Returns True when ``jax.distributed.initialize`` was called, False for
    the single-process no-op (no cluster markers in the environment and no
    explicit arguments).  Safe to call unconditionally at program start;
    explicit arguments always force initialization.

    After a True return, ``jax.devices()`` is global across hosts and every
    mesh helper and ``shard_map`` entry point in this package works
    unchanged — sharded arrays just carry multi-host shardings.
    """
    explicit = any(v is not None
                   for v in (coordinator_address, num_processes, process_id))
    if not explicit and not _cluster_env_present():
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
