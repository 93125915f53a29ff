"""steps_per_execution (lax.scan multi-step) and continuous-eval tests."""

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


def _setup(grad_accum_steps=1, clipnorm=None):
    params = cfg.from_dict({
        "experiment": {"name": "ms"},
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
        "training": {
            "train_steps": 100, "save_every": 50,
            "batch_size": {"train": 4, "val": 4},
            "optimizer": {
                "name": "sgd", "momentum": 0.9,
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 2, "values": [0.01],
                              "boundaries": []}},
        },
    })
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    norm = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    if clipnorm is not None:
        params.training.optimizer.clipnorm = clipnorm
    tx, schedule = build_optimizer(params.training.optimizer, 100)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(variables, tx)
    step = step_lib.make_train_step(
        model, loss_fn, encoder, norm, tx, schedule,
        use_weight_decay=False, weight_decay_alpha=0.0,
        compute_dtype=jnp.float32, grad_accum_steps=grad_accum_steps,
        clipnorm=clipnorm)
    return state, step


def test_gradient_norm_metric_is_post_clip():
    """`gradient-norm` reports the POST-clip global norm, matching the
    reference's global_norm(clipped gradients) (executor.py:440). With a
    clipnorm far below the raw gradient norm, the global-norm clip scales
    the whole tree to exactly `clipnorm`."""
    clip = 1e-3
    state_raw, step_raw = _setup()
    state_clip, step_clip = _setup(clipnorm=clip)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(4, (64, 64), 10, 4, seed=0).items()}

    _, metrics_raw = jax.jit(step_raw)(state_raw, batch)
    _, metrics_clip = jax.jit(step_clip)(state_clip, batch)

    raw_norm = float(metrics_raw["gradient-norm"])
    clipped_norm = float(metrics_clip["gradient-norm"])
    assert raw_norm > clip * 10  # untrained net: raw norm >> clip
    np.testing.assert_allclose(clipped_norm, clip, rtol=1e-5)


def test_multi_step_scan_equals_python_loop():
    state_a, step = _setup()
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    batches = [synthetic_train_batch(4, (64, 64), 10, 4, seed=i)
               for i in range(3)]

    # python loop
    step_j = jax.jit(step)
    for b in batches:
        state_a, metrics_a = step_j(
            state_a, {k: jnp.asarray(v) for k, v in b.items()})

    # lax.scan over stacked batches
    multi = jax.jit(step_lib.make_multi_step(step))
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    state_b, metrics_b = multi(state_b, stacked)

    assert int(state_b.step) == int(state_a.step) == 3
    np.testing.assert_allclose(
        float(metrics_b["total-loss"]), float(metrics_a["total-loss"]),
        rtol=1e-5)
    a_leaf = jax.tree_util.tree_leaves(state_a.params)[0]
    b_leaf = jax.tree_util.tree_leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(a_leaf), np.asarray(b_leaf),
                               rtol=1e-5, atol=1e-6)


def test_continuous_evaluate_one_pass(tmp_path):
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    from retinanet_tpu.train.executor import Executor

    pattern, ann = write_synthetic_tfrecords(
        str(tmp_path / "d"), "train", 1, 6, num_classes=4,
        write_annotations=True)
    params = cfg.from_dict({
        "experiment": {"name": "ce", "model_dir": str(tmp_path / "m")},
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
        "training": {
            "train_steps": 2, "save_every": 2,
            "annotation_file_path": ann,
            "batch_size": {"train": 4, "val": 4},
            "optimizer": {
                "name": "sgd",
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1, "values": [0.01],
                              "boundaries": []}},
        },
        "dataloader_params": {"tfrecords": {"train": pattern,
                                            "val": pattern},
                              "shuffle_buffer_size": 4},
        "inference": {"pre_nms_top_k": 200, "max_detections": 10},
    })
    trainer = Executor(
        params, run_mode="train",
        train_input_fn=lambda: InputPipeline("train", params, max_boxes=15),
        enable_tensorboard=False)
    trainer.train()

    watcher = Executor(
        params, run_mode="continuous_eval",
        val_input_fn=lambda: InputPipeline("val", params),
        enable_tensorboard=False)
    watcher.continuous_evaluate(sleep_time=0, max_iterations=1)
    assert int(watcher.state.step) == 2  # restored the new checkpoint
