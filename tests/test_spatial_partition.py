"""Spatial partitioning: 2-D (data, spatial) mesh — images sharded along H,
GSPMD halo-exchanged convs (see parallel/mesh.py:create_mesh).

Validated on the 8-virtual-device CPU mesh (conftest.py): the SAME train
step run data-parallel-only (8,) and spatially partitioned (2, 4) must
produce matching losses/params — spatial sharding changes the collective
schedule, not the math. The reference's TF2 strategies have no
equivalent (distribute.py only replicates whole images)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.parallel import mesh as mesh_lib

from test_multi_step import _setup
from retinanet_tpu.data.synthetic import synthetic_train_batch


def _run(state, step, batch, mesh):
    sharded = mesh_lib.shard_batch(batch, mesh)
    new_state, metrics = jax.jit(step)(state, sharded)
    return new_state, {k: float(v) for k, v in metrics.items()}, sharded


def test_spatial_step_matches_data_parallel():
    state, step = _setup()
    batch = {k: np.asarray(v)
             for k, v in synthetic_train_batch(8, (64, 64), 10, 4,
                                               seed=3).items()}

    mesh_dp = mesh_lib.create_mesh()                 # (8,)
    mesh_sp = mesh_lib.create_mesh(spatial=4)        # (2, 4)
    assert mesh_sp.shape == {"data": 2, "spatial": 4}

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    state_b = jax.tree_util.tree_map(jnp.copy, state)
    new_a, m_a, _ = _run(state_a, step, batch, mesh_dp)
    new_b, m_b, sharded = _run(state_b, step, batch, mesh_sp)

    # the image really is sharded along H over the spatial axis
    img = sharded["image"]
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(4, 16, 64, 3)}
    # label leaves stay data-sharded only
    assert {s.data.shape for s in sharded["boxes"].addressable_shards} == {
        (4,) + batch["boxes"].shape[1:]}

    # identical math, different collective schedule -> fp-tolerance match
    assert m_a["total-loss"] == pytest.approx(m_b["total-loss"], rel=1e-5)
    assert m_a["num-anchors-matched"] == m_b["num-anchors-matched"]
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                           - y.astype(jnp.float32)))),
        new_a.params, new_b.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_spatial_mesh_validation():
    with pytest.raises(ValueError):
        mesh_lib.create_mesh(spatial=3)  # 8 % 3 != 0


def test_spatial_indivisible_h_falls_back_to_data_only():
    """H not divisible by the spatial axis -> image stays data-sharded
    (no silent wrong halo math)."""
    mesh = mesh_lib.create_mesh(spatial=4)
    x = np.zeros((8, 30, 32, 3), np.float32)  # 30 % 4 != 0
    out = mesh_lib.shard_batch({"image": x}, mesh)["image"]
    assert {s.data.shape for s in out.addressable_shards} == {(4, 30, 32, 3)}


def test_grad_accum_data_mesh_bitwise():
    """1-D data mesh + grad_accum_steps=2 with two identical micro-batches:
    (l+l)/2 == l exactly in binary fp, so the loss must be BITWISE equal to
    the plain sharded step's (also validated in the real 2-process harness,
    tools/multiprocess_smoke.py check 3b)."""
    state, step = _setup()
    batch = {k: np.asarray(v)
             for k, v in synthetic_train_batch(8, (64, 64), 10, 4,
                                               seed=5).items()}
    mesh_dp = mesh_lib.create_mesh()                 # (8,)
    state_a = jax.tree_util.tree_map(jnp.copy, state)
    _, m_plain, _ = _run(state_a, step, batch, mesh_dp)

    accum_state, accum_step = _setup(grad_accum_steps=2)
    stacked = {k: np.stack([v, v]) for k, v in batch.items()}
    sharded = mesh_lib.shard_batch(stacked, mesh_dp, leading_dims=1)
    _, metrics = jax.jit(accum_step)(accum_state, sharded)
    assert float(metrics["total-loss"]) == m_plain["total-loss"]
    assert (float(metrics["num-anchors-matched"])
            == m_plain["num-anchors-matched"])


def test_spatial_composes_with_grad_accum():
    """(data, spatial) mesh + grad_accum_steps=2: batch [K, B/K, H, W, C]
    shards the micro dim over 'data' and H over 'spatial'.

    Tolerance, not bitwise: the accum program's GSPMD schedule differs
    from the plain step's, and flax BatchNorm's E[x^2]-E[x]^2 variance
    form amplifies partial-sum reassociation under catastrophic
    cancellation (measured here: ~2e-3 relative loss drift in f32, while
    isolated inline-vs-scan-body forward AND gradient probes on this mesh
    are bitwise identical — i.e. the drift is fp scheduling, not wrong
    data). The bitwise guarantee is pinned on the 1-D mesh above; this
    test pins the sharding composition (micro dim over data, H over
    spatial) and semantic agreement."""
    state, step = _setup()
    batch = {k: np.asarray(v)
             for k, v in synthetic_train_batch(8, (64, 64), 10, 4,
                                               seed=5).items()}
    mesh_sp = mesh_lib.create_mesh(spatial=2)        # (4, 2)

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    _, m_plain, _ = _run(state_a, step, batch, mesh_sp)

    accum_state, accum_step = _setup(grad_accum_steps=2)
    stacked = {k: np.stack([v, v]) for k, v in batch.items()}
    sharded = mesh_lib.shard_batch(stacked, mesh_sp, leading_dims=1)
    # image leaves [2, 8, 64, 64, 3]: micro dim sharded over data, H over
    # spatial
    img_shapes = {s.data.shape for s in sharded["image"].addressable_shards}
    assert img_shapes == {(2, 2, 32, 64, 3)}, img_shapes
    _, metrics = jax.jit(accum_step)(accum_state, sharded)
    assert float(metrics["total-loss"]) == pytest.approx(
        m_plain["total-loss"], rel=1e-2)
    # selection/encoding is integer-exact regardless of fp schedule
    assert (float(metrics["num-anchors-matched"])
            == m_plain["num-anchors-matched"])
