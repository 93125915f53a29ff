"""Layer-freezing via config freeze_variables (reference FREEZE_VARS_REGEX,
model/builder.py:19-30 + executor.py:154-176)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.label_encoder import make_batched_encoder
from retinanet_tpu.data.preprocessing import make_device_normalizer
from retinanet_tpu.data.synthetic import synthetic_train_batch
from retinanet_tpu.losses.losses import RetinaNetLoss
from retinanet_tpu.models.retinanet import FREEZE_VARS_REGEX, build_model
from retinanet_tpu.optimizers.builder import build_optimizer, freeze_mask_fn
from retinanet_tpu.train import step as step_lib
from retinanet_tpu.train.train_state import create_train_state


def _params(freeze):
    return cfg.from_dict({
        "experiment": {"name": "fz"},
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
            "train_steps": 10, "save_every": 10,
            "freeze_variables": freeze,
            "batch_size": {"train": 4, "val": 4},
            "optimizer": {
                "name": "sgd", "momentum": 0.9,
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.01,
                              "warmup_steps": 1, "values": [0.1],
                              "boundaries": []}},
        },
    })


def test_freeze_backbone_keeps_backbone_constant():
    params = _params(["backbone"])
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    norm = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, 10,
        freeze_variables=["backbone"])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, norm, tx, schedule, False, 0.0,
        jnp.float32))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(4, (64, 64), 10, 4, seed=0).items()}

    before_bb = np.asarray(
        variables["params"]["backbone"]["stem"]["conv"]["kernel"])
    before_head = np.asarray(
        variables["params"]["box_head"]["conv0"]["conv"]["kernel"])
    for _ in range(3):
        state, _ = step(state, batch)
    after_bb = np.asarray(
        state.params["backbone"]["stem"]["conv"]["kernel"])
    after_head = np.asarray(
        state.params["box_head"]["conv0"]["conv"]["kernel"])
    np.testing.assert_array_equal(before_bb, after_bb)  # frozen
    assert not np.allclose(before_head, after_head)     # training


def test_freeze_resnet_initial_bn_runs_in_inference_mode():
    """freeze_variables=['resnet_initial'] must put stem_bn in inference
    mode (moving stats, no running-stat update), matching the reference's
    Keras trainable=False semantics — regression test for the module-path
    vs param-path trailing-slash mismatch in the frozen-BN interceptor."""
    params = _params(["resnet_initial"])
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    norm = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    tx, schedule = build_optimizer(
        params.training.optimizer, 10,
        freeze_variables=["resnet_initial"])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, norm, tx, schedule, False, 0.0,
        jnp.float32, freeze_keys=["resnet_initial"]))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(4, (64, 64), 10, 4, seed=0).items()}

    before_stem_bn = jax.tree_util.tree_map(
        np.asarray, variables["batch_stats"]["backbone"]["stem_bn"])
    before_other_bn = np.asarray(
        variables["batch_stats"]["neck"]["p3_in_bn"]["bn"]["mean"])
    for _ in range(3):
        state, _ = step(state, batch)
    after_stem_bn = jax.tree_util.tree_map(
        np.asarray, state.batch_stats["backbone"]["stem_bn"])
    after_other_bn = np.asarray(
        state.batch_stats["neck"]["p3_in_bn"]["bn"]["mean"])
    # frozen BN: running stats must not advance
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           before_stem_bn, after_stem_bn)
    # unfrozen BN still advances
    assert not np.allclose(before_other_bn, after_other_bn)


def test_freeze_mask_patterns():
    params = _params([])
    model = build_model(params)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0))
    p = variables["params"]

    mask_bb = freeze_mask_fn(["backbone"])(p)
    assert not mask_bb["backbone"]["stem"]["conv"]["kernel"]
    assert mask_bb["neck"]["p3_in_conv"]["conv"]["kernel"]

    mask_head = freeze_mask_fn(["head"])(p)
    assert not mask_head["box_head"]["conv0"]["conv"]["kernel"]
    # prediction convs excluded from the 'head' freeze (reference regex)
    assert mask_head["box_head"]["prediction"]["conv"]["kernel"]

    mask_bn = freeze_mask_fn(["bn"])(p)
    assert not mask_bn["backbone"]["stem_bn"]["bn"]["scale"]
    assert mask_bn["backbone"]["stem"]["conv"]["kernel"]


def test_unknown_freeze_key_raises():
    with pytest.raises(ValueError, match="freeze_variables"):
        freeze_mask_fn(["nonsense"])({})
    assert set(FREEZE_VARS_REGEX) == {
        "backbone", "backbone-bn", "fpn", "fpn-bn", "head", "head-bn",
        "bn", "resnet_initial"}
