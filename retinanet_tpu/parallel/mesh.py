"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's tf.distribute strategies (reference retinanet/distribute.py:7-60).

Design (SURVEY.md §2.2): one 1-D `jax.sharding.Mesh` over all devices
(ICI within a slice, DCN across slices); the global batch is sharded over
the 'data' axis with NamedSharding; parameters/optimizer state are
replicated. XLA's SPMD partitioner inserts the gradient all-reduce, the
loss-normalizer sum and sync-BN moment reductions automatically — no
strategy object, no explicit collectives in model code.

Multi-host bring-up: call `initialize_distributed()` (wraps
`jax.distributed.initialize()`) before `create_mesh()`; each process then
feeds its own shard of the global batch (see data/pipeline.py file
sharding), mirroring TPUStrategy's multi-host input
(reference executor.py:178-202).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (TPU pods). No-op for single-process runs.

    Replaces TPUClusterResolver.connect (reference distribute.py:44-58);
    on TPU VMs the arguments are auto-detected from the metadata server.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch (numpy tree) with batch-dim sharding.

    Under multi-host, each process passes its local shard and we assemble
    the global array from per-host shards.
    """
    n_dev = mesh.shape[axis_name]

    def _put(x):
        x = np.asarray(x)
        # batches indivisible by the mesh (e.g. a small eval batch) fall
        # back to replication rather than failing the sharding constraint
        if x.ndim == 0 or x.shape[0] % n_dev != 0:
            spec = P()
        else:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(_put, batch)


def num_devices() -> int:
    return jax.device_count()


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch size (reference
    dataloader/utils get_per_replica_batch_size analog at host level)."""
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process "
            f"count {count}")
    return global_batch_size // count
