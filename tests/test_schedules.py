"""LR schedule unit tests (reference retinanet/optimizers/*.py semantics,
including the boundary-1 shift in PiecewiseConstantDecayWithLinearWarmup)."""

import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.optimizers import schedules


def test_piecewise_warmup_and_boundaries():
    s = schedules.piecewise_constant_decay_with_warmup(
        warmup_learning_rate=0.0067, warmup_steps=2000,
        boundaries=[154286, 163928], values=[0.32, 0.032, 0.0032])
    # linear warmup: lr(0)=warmup, lr(warmup)=values[0]
    np.testing.assert_allclose(float(s(0)), 0.0067, rtol=1e-6)
    np.testing.assert_allclose(
        float(s(1000)), 0.0067 + 0.5 * (0.32 - 0.0067), rtol=1e-6)
    np.testing.assert_allclose(float(s(2000)), 0.32, rtol=1e-6)
    # the reference shifts boundaries by -1 (ref
    # piecewise_constant_decay_with_warmup.py:10-12): the drop happens AT
    # boundary-1 < step
    np.testing.assert_allclose(float(s(154285)), 0.32, rtol=1e-6)
    np.testing.assert_allclose(float(s(154286)), 0.032, rtol=1e-6)
    np.testing.assert_allclose(float(s(163928)), 0.0032, rtol=1e-6)
    np.testing.assert_allclose(float(s(168750)), 0.0032, rtol=1e-6)


def test_cosine_warmup():
    s = schedules.cosine_decay_with_warmup(
        initial_learning_rate=0.1, warmup_learning_rate=0.01,
        warmup_steps=100, total_steps=1100)
    np.testing.assert_allclose(float(s(0)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.055, rtol=1e-6)
    # reference feeds the GLOBAL step to CosineDecay (not step - warmup)
    p = min(200, 1000) / 1000
    expected = 0.1 * 0.5 * (1 + np.cos(np.pi * p))
    np.testing.assert_allclose(float(s(200)), expected, rtol=1e-6)
    # clipped at decay_steps
    np.testing.assert_allclose(float(s(5000)), 0.0, atol=1e-7)


def test_inverse_decay():
    s = schedules.inverse_decay(0.1, 0.01)
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.1 / 2.0, rtol=1e-6)


def test_from_params_dispatch():
    lr = cfg.from_dict({
        "experiment": {"name": "t"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5, "filters": 8},
            "head": {"num_convs": 1, "filters": 8, "num_classes": 2,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {"optimizer": {"lr_params": {
            "schedule_type": "inverse_decay",
            "initial_learning_rate": 0.5, "decay_rate": 0.1}}},
    }).training.optimizer.lr_params
    s = schedules.from_params(lr, total_steps=100)
    np.testing.assert_allclose(float(s(0)), 0.5, rtol=1e-6)

    with pytest.raises(ValueError, match="Invalid learning rate"):
        schedules.from_params(
            cfg.ConfigDict({"schedule_type": "nope"}), 100)
