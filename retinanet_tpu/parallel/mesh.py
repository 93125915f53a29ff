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
SPATIAL_AXIS = "spatial"


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


def resolve_strategy(strategy_params) -> str:
    """Consume training.strategy the JAX way (reference distribute.py:7-60).

    The reference dispatched on `strategy.type` to build a tf.distribute
    strategy and resolved `strategy.name` into a TPUClusterResolver
    (TPU_NAME env var overriding the config, distribute.py:26-42). Under
    JAX there is no strategy object — the runtime owns device discovery
    and GSPMD owns distribution — so this validates the requested type
    against the live backend (loud mismatch warning instead of silently
    training on the wrong hardware), applies the same TPU_NAME override
    semantics for logging, and rejects unknown types exactly as the
    reference did. Returns the resolved device/TPU name.
    """
    import logging as _logging
    log = _logging.getLogger(__name__)
    stype = str(strategy_params.get("type", "tpu")).lower()
    name = str(strategy_params.get("name", ""))
    if stype not in ("tpu", "gpu", "multi_gpu", "cpu"):
        raise ValueError(
            f"Unsupported training.strategy.type: {stype!r} "
            "(expected tpu / gpu / multi_gpu / cpu)")
    if stype == "tpu":
        env_name = os.environ.get("TPU_NAME", "")
        if env_name and env_name != name:
            log.warning("TPU name %r overridden to %r by env TPU_NAME",
                        name, env_name)
            name = env_name
    backend = jax.default_backend()
    # axon = tunneled TPU runtime; CPU is always accepted so the virtual
    # multi-device test mesh (JAX_PLATFORMS=cpu) can run any config as-is
    compatible = {"tpu": ("tpu", "axon", "cpu"),
                  "gpu": ("gpu", "cuda", "rocm", "cpu"),
                  "multi_gpu": ("gpu", "cuda", "rocm", "cpu"),
                  "cpu": ("cpu",)}[stype]
    if backend not in compatible:
        log.warning(
            "training.strategy.type=%r but the JAX backend is %r — "
            "proceeding on %d %s device(s)", stype, backend,
            jax.device_count(), backend)
    else:
        log.info("strategy %s(name=%r) resolved to %d %s device(s)",
                 stype, name, jax.device_count(), backend)
    return name


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS,
                spatial: int = 1) -> Mesh:
    """Data-parallel mesh over all (or the given) devices.

    With ``spatial > 1`` the mesh is 2-D ``(data, spatial)``: images are
    additionally sharded along H over the spatial axis (see
    ``shard_batch``), and GSPMD turns the convolutions into
    halo-exchanged partial convs over ICI — TPU spatial partitioning.
    This trades batch-parallel replicas for per-image parallelism, the
    lever for high-resolution configs (e.g. the 1280x1280 reference
    config) where per-chip memory, not batch size, is the binding
    constraint. The reference's TF2 strategies had no equivalent (TF
    spatial partitioning was TPUEstimator-only).

    Multi-process note: local devices must form whole spatial groups
    (data axis across hosts, spatial within a host) — the default
    reshape of jax.devices() does exactly that on TPU pods, where
    process-local devices are contiguous.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spatial <= 1:
        return Mesh(devices, (axis_name,))
    if len(devices) % spatial:
        raise ValueError(
            f"{len(devices)} devices not divisible by spatial={spatial}")
    return Mesh(devices.reshape(len(devices) // spatial, spatial),
                (axis_name, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS,
                leading_dims: int = 0):
    """Device-put a host batch (numpy tree) with batch-dim sharding.

    Under multi-host, each process passes its DISTINCT local shard (the
    train pipeline shards the file list per host) and we assemble the
    global array from per-host shards.

    Scalar leaves (ndim <= leading_dims) are REPLICATED: they must be
    identical across processes (they are assembled via
    make_array_from_process_local_data without cross-process verification,
    so distinct per-process scalars would be silently merged — pass only
    process-invariant scalars, e.g. a shared step counter).

    ``leading_dims`` skips that many axes before the batch axis — used for
    the ``steps_per_execution`` multi-step path where batches are stacked
    on a leading scan axis: shape (steps, batch, ...) shards axis 1.
    """
    n_dev = mesh.shape[axis_name]
    # Divisibility is a PER-PROCESS property: each process contributes its
    # local shard, which must split over its local share of the mesh
    # (n_dev/process_count devices). Checking the local shape against the
    # GLOBAL device count silently demoted legitimate shardings to
    # replication whenever local_batch < n_dev — with distinct per-process
    # data feeding a "replicated" array (caught by
    # tools/multiprocess_smoke.py's real 2-process run).
    per_process_div = max(1, n_dev // jax.process_count())

    def _put(x):
        x = np.asarray(x)
        axis = leading_dims
        # Single-process: batches indivisible by the mesh (e.g. a small
        # eval batch) fall back to replication. Multi-process: replication
        # would quietly merge DISTINCT per-process data into one
        # "replicated" array — refuse instead.
        if x.ndim <= axis or x.shape[axis] % per_process_div != 0:
            if jax.process_count() > 1 and x.ndim > axis:
                raise ValueError(
                    f"local batch dim {x.shape[axis]} not divisible by "
                    f"this process's device share ({per_process_div}); "
                    "replication across processes with distinct data "
                    "would be silently wrong")
            spec = P()
            axis = None
        else:
            dims = [None] * x.ndim
            dims[axis] = axis_name
            # 2-D (data, spatial) mesh: image-rank leaves (B, H, W, C)
            # additionally shard H over the spatial axis — GSPMD inserts
            # the conv halo exchanges. Label leaves (boxes/classes/valid,
            # rank <= 3) stay data-sharded only.
            if (SPATIAL_AXIS in mesh.shape and x.ndim - axis >= 4
                    and x.shape[axis + 1] % mesh.shape[SPATIAL_AXIS] == 0):
                dims[axis + 1] = SPATIAL_AXIS
            spec = P(*dims)
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        if axis is None:
            global_shape = x.shape
        else:
            global_shape = (x.shape[:axis]
                            + (x.shape[axis] * jax.process_count(),)
                            + x.shape[axis + 1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree_util.tree_map(_put, batch)


def process_slice(x: np.ndarray, process_index: int,
                  process_count: int) -> np.ndarray:
    """This process's contiguous slice of a batch that every process holds
    in full. The union of slices over all processes is exactly the batch,
    with no overlap — the invariant multi-host evaluation relies on.
    """
    b = x.shape[0]
    if b % process_count:
        raise ValueError(
            f"batch {b} not divisible by process count {process_count}")
    per = b // process_count
    return x[process_index * per:(process_index + 1) * per]


def shard_global_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard a batch that EVERY process holds identically.

    Validation iteration is deterministic (seeded file order, no sample
    shuffle), so all hosts materialize the same batches; each process
    contributes only its contiguous 1/P slice and the global shape equals
    the host batch shape — every image enters the global batch EXACTLY
    once. Contrast with `shard_batch`, which concatenates distinct
    per-host shards (global = local x P) and would duplicate each image P
    times if fed identical host batches (the reference instead distributed
    one val dataset across replicas: reference executor.py:178-202).
    """
    pcount = jax.process_count()
    pidx = jax.process_index()
    n_dev = mesh.shape[axis_name]

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_dev != 0:
            spec = P()
        else:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if pcount == 1:
            return jax.device_put(x, sharding)
        local = x if spec == P() else process_slice(x, pidx, pcount)
        return jax.make_array_from_process_local_data(
            sharding, local, x.shape)

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
