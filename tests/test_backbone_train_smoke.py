"""Full train-step smoke for the EfficientNet and MobileDet families.

The param-parity and forward tests (test_backbones.py) don't exercise the
TRAIN-mode branches — drop-connect, SE, fused-conv BN stat updates — or
their gradients. One optimizer step per family: finite loss, finite grads,
batch stats mutated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import anchors as anchor_lib
from retinanet_tpu.data.label_encoder import make_batched_encoder
from retinanet_tpu.data.synthetic import synthetic_train_batch
from retinanet_tpu.losses.losses import RetinaNetLoss
from retinanet_tpu.models.retinanet import build_model
from retinanet_tpu.optimizers.builder import build_optimizer
from retinanet_tpu.train import step as step_lib
from retinanet_tpu.train.train_state import create_train_state


def _params(backbone):
    return cfg.from_dict({
        "experiment": {"name": "smoke"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": backbone,
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {
            "train_steps": 4, "save_every": 100,
            "batch_size": {"train": 4, "val": 4},
            "optimizer": {
                "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1,
                              "values": [0.01], "boundaries": []}}},
    })


@pytest.mark.parametrize("backbone", [
    {"type": "efficientnet-lite0"},
    {"type": "mobiledet_cpu"},
], ids=["efficientnet-lite0", "mobiledet_cpu"])
def test_one_train_step(backbone):
    params = _params(backbone)
    model = build_model(params)
    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params)
    loss_fn = RetinaNetLoss(6, params.loss)
    tx, schedule = build_optimizer(params.training.optimizer, 4)

    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    old_stats = jax.device_get(state.batch_stats)

    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, lambda im: im / 127.5 - 1.0, tx, schedule,
        use_weight_decay=True, weight_decay_alpha=1e-4,
        compute_dtype=jnp.float32), donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in synthetic_train_batch(
        4, (64, 64), 20, 6, seed=0).items()}
    state, metrics = step(state, batch)
    m = jax.device_get(metrics)
    assert np.isfinite(m["total-loss"]), m
    assert np.isfinite(m["gradient-norm"]) and m["gradient-norm"] > 0, m
    assert int(state.step) == 1

    # train-mode BN actually updated the running stats
    new_stats = jax.device_get(state.batch_stats)
    changed = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), old_stats, new_stats)
    assert max(jax.tree_util.tree_leaves(changed)) > 0
