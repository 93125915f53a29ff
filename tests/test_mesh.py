"""Sharding-math tests for parallel/mesh.py — in particular the multi-host
evaluation invariant: each image enters the global batch exactly once."""

import jax
import numpy as np
import pytest

from retinanet_tpu.parallel import mesh as mesh_lib


@pytest.mark.parametrize("pcount", [1, 2, 4, 8])
def test_process_slice_partitions_batch(pcount):
    """Union of per-process slices == full batch, pairwise disjoint."""
    x = np.arange(16 * 3).reshape(16, 3)
    slices = [mesh_lib.process_slice(x, p, pcount) for p in range(pcount)]
    assert all(s.shape[0] == 16 // pcount for s in slices)
    np.testing.assert_array_equal(np.concatenate(slices, axis=0), x)
    # disjointness: row ids across slices are unique
    ids = np.concatenate([s[:, 0] for s in slices])
    assert len(np.unique(ids)) == 16


def test_process_slice_rejects_indivisible():
    with pytest.raises(ValueError):
        mesh_lib.process_slice(np.zeros((7, 2)), 0, 2)


def test_shard_global_batch_single_process_values():
    mesh = mesh_lib.create_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    out = mesh_lib.shard_global_batch({"x": x}, mesh)["x"]
    assert out.shape == x.shape  # global shape == host batch shape
    np.testing.assert_array_equal(np.asarray(out), x)
    # actually distributed over the mesh, one row-block per device
    assert len(out.sharding.device_set) == jax.device_count()


def test_shard_batch_leading_dims_stacked():
    """steps_per_execution stacking: (steps, batch, ...) shards axis 1."""
    mesh = mesh_lib.create_mesh()
    x = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    out = mesh_lib.shard_batch({"x": x}, mesh, leading_dims=1)["x"]
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), x)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 1, 3)}  # batch axis split, scan axis whole


def test_shard_batch_indivisible_replicates():
    mesh = mesh_lib.create_mesh()
    x = np.zeros((3, 2), np.float32)  # 3 % 8 != 0
    out = mesh_lib.shard_batch({"x": x}, mesh)["x"]
    assert out.shape == x.shape
    assert all(s.data.shape == x.shape for s in out.addressable_shards)
