"""Auxiliary IoU-prediction head end to end (reference
head/builder.py:46-72, loss_impl.py:108-131, retinanet_loss.py aux path)."""

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


def _params():
    return cfg.from_dict({
        "experiment": {"name": "aux"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16, "min_level": 3,
                               "max_level": 5, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
            "auxillary_head": {"use_auxillary_head": True, "num_convs": 1,
                               "filters": 16},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "loss": {"auxillary_loss_weight": 0.25},
        "training": {
            "train_steps": 4, "save_every": 4,
            "batch_size": {"train": 2, "val": 2},
            "optimizer": {
                "name": "sgd",
                "lr_params": {"schedule_type": "piecewise_constant_decay",
                              "warmup_learning_rate": 0.001,
                              "warmup_steps": 1, "values": [0.01],
                              "boundaries": []}},
        },
    })


def test_aux_head_forward_and_loss():
    params = _params()
    model = build_model(params)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert "iou-predictions" in out
    assert out["iou-predictions"]["3"].shape == (2, 8, 8, 9)
    # prior bias 0.5 -> logit 0
    bias = variables["params"]["auxillary_head"]["prediction"]["conv"]["bias"]
    np.testing.assert_allclose(np.asarray(bias), 0.0, atol=1e-6)

    anchors = anchor_lib.from_params(params)
    encoder = make_batched_encoder(anchors, params.encoder_params,
                                   use_iou_targets=True)
    norm = make_device_normalizer(params)
    loss_fn = RetinaNetLoss(4, params.loss)
    tx, schedule = build_optimizer(params.training.optimizer, 4)
    state = create_train_state(variables, tx)
    step = jax.jit(step_lib.make_train_step(
        model, loss_fn, encoder, norm, tx, schedule, False, 0.0,
        jnp.float32))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(2, (64, 64), 10, 4, seed=0).items()}
    state, metrics = step(state, batch)
    assert float(metrics["iou-prediction-loss"]) > 0.0
    expected = (float(metrics["class-loss"])
                + 50.0 * float(metrics["box-loss"])
                + 0.25 * float(metrics["iou-prediction-loss"]))
    np.testing.assert_allclose(
        float(metrics["weighted-loss"]), expected, rtol=1e-5)
