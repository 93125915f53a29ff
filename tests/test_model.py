"""Model construction: param-count checksum vs the reference and forward
shape checks.

Checksum provenance: the reference model (current code at
/root/reference/retinanet/model/*) built for
configs/v3-32/mscoco-retinanet-resnet50-640x640-30x-256.json has exactly
34,389,556 trainable parameters and 78,208 BN moving statistics (verified by
instantiating the reference with tf_keras; the README.md:50 figure of
33,865,815 predates the current reference code and counted a model with
frozen initial layers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.models.retinanet import build_model

RESNET50_FPN_TRAINABLE = 34_389_556
RESNET50_FPN_BATCH_STATS = 78_208


def _params(**overrides):
    base = {
        "experiment": {"name": "t"},
        "input": {"input_shape": [640, 640], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 50},
            "feature_fusion": {"type": "fpn", "fusion_mode": "sum",
                               "filters": 256, "min_level": 3,
                               "max_level": 7, "backbone_max_level": 5},
            "head": {"num_convs": 4, "filters": 256, "num_classes": 80,
                     "num_anchors": 9},
            "activation": {"type": "relu6"},
        },
    }
    base = cfg.deep_merge(base, overrides)
    return cfg.from_dict(base)


def _count(tree):
    return sum(p.size for p in jax.tree_util.tree_leaves(tree))


def test_resnet50_fpn_param_checksum():
    model = build_model(_params())
    x = jnp.zeros((1, 640, 640, 3), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    assert _count(variables["params"]) == RESNET50_FPN_TRAINABLE
    assert _count(variables["batch_stats"]) == RESNET50_FPN_BATCH_STATS


def test_forward_shapes_small():
    params = _params(
        input={"input_shape": [128, 128], "channels": 3},
        architecture={
            "backbone": {"type": "resnet", "depth": 18},
            "feature_fusion": {"filters": 32},
            "head": {"num_convs": 1, "filters": 32, "num_classes": 4,
                     "num_anchors": 9},
        })
    model = build_model(params)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert set(out) == {"box-predictions", "class-predictions"}
    for lvl in range(3, 8):
        hw = 128 // 2 ** lvl
        assert out["box-predictions"][str(lvl)].shape == (2, hw, hw, 36)
        assert out["class-predictions"][str(lvl)].shape == (2, hw, hw, 36)
    # prediction outputs are fp32 even in mixed precision
    assert out["box-predictions"]["3"].dtype == jnp.float32


def test_class_head_bias_prior():
    params = _params(
        input={"input_shape": [64, 64], "channels": 3},
        architecture={
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"filters": 16, "min_level": 3, "max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        })
    model = build_model(params)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    bias = variables["params"]["class_head"]["prediction"]["conv"]["bias"]
    np.testing.assert_allclose(
        np.asarray(bias), -np.log((1 - 0.01) / 0.01), rtol=1e-6)


def test_train_mode_updates_batch_stats():
    params = _params(
        input={"input_shape": [64, 64], "channels": 3},
        architecture={
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"filters": 16, "min_level": 3, "max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        })
    model = build_model(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["backbone"]["stem_bn"]["bn"]["mean"]
    after = mutated["batch_stats"]["backbone"]["stem_bn"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("fusion", ["fast_attention", "fast_channel_attention"])
def test_fusion_modes(fusion):
    params = _params(
        input={"input_shape": [64, 64], "channels": 3},
        architecture={
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"filters": 16, "fusion_mode": fusion,
                               "min_level": 3, "max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        })
    model = build_model(params)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["box-predictions"]["3"].shape == (1, 8, 8, 36)


def test_use_sync_false_raises_on_multi_device():
    """batch_norm.use_sync=false must fail loudly (not silently compute
    sync moments) on a multi-device mesh — the knob is otherwise dead."""
    params = _params()
    params.architecture.batch_norm.use_sync = False
    assert jax.device_count() > 1  # conftest provides the 8-device mesh
    with pytest.raises(ValueError, match="use_sync"):
        build_model(params)
