"""Neck variants: MLAF, stacked MLAF, FPN-P5, BalanceFeatures forward."""

import jax
import jax.numpy as jnp
import pytest

from retinanet_tpu.models.fpn import FPNP5
from retinanet_tpu.models.layers import BalanceFeatures
from retinanet_tpu.models.mlaf import (MultiLevelAttentionFusion,
                                       StackedMultiLevelAttentionFusion)


def _features(batch=1, base=16, channels=(64, 128, 256)):
    return {
        str(lvl): jnp.ones((batch, base // 2 ** i, base // 2 ** i, ch))
        for i, (lvl, ch) in enumerate(zip((3, 4, 5), channels))
    }


@pytest.mark.parametrize("channel_attention", [False, True])
def test_mlaf_forward(channel_attention):
    neck = MultiLevelAttentionFusion(
        filters=32, min_level=3, max_level=7, backbone_max_level=5,
        use_channel_attention=channel_attention)
    feats = _features()
    v = neck.init(jax.random.PRNGKey(0), feats, train=False)
    out = neck.apply(v, feats, train=False)
    assert set(out) == {"3", "4", "5", "6", "7"}
    for lvl in range(3, 8):
        hw = 128 // 2 ** lvl  # base 16 at level 3 => 16 = 128/8
        assert out[str(lvl)].shape == (1, hw, hw, 32)


def test_stacked_mlaf_forward():
    neck = StackedMultiLevelAttentionFusion(
        filters=32, num_repeats=2, min_level=3, max_level=7,
        backbone_max_level=5)
    feats = _features()
    v = neck.init(jax.random.PRNGKey(0), feats, train=False)
    out = neck.apply(v, feats, train=False)
    assert set(out) == {"3", "4", "5", "6", "7"}
    # lateral conv only in the first block
    assert "l3_conv" in v["params"]["mlaf_1"]
    assert "l3_conv" not in v["params"]["mlaf_2"]


def test_fpn_p5_forward():
    neck = FPNP5(filters=32, min_level=3, max_level=7, backbone_max_level=5)
    feats = _features()
    v = neck.init(jax.random.PRNGKey(0), feats, train=False)
    out = neck.apply(v, feats, train=False)
    assert set(out) == {"3", "4", "5", "6", "7"}
    assert out["7"].shape == (1, 1, 1, 32)
    # Every level carries an output BN (reference fpn_p5.py:121-125).
    for lvl in range(3, 8):
        assert f"p{lvl}_out_bn" in v["params"]
    # Output convs default to no bias before BN (fpn_p5.py:82,
    # conv_2d.use_bias_before_bn default false); laterals keep bias.
    assert "bias" not in v["params"]["p3_out_conv"]["conv"]
    assert "bias" in v["params"]["l3_conv"]["conv"]


def test_fpn_p5_use_bias_before_bn():
    neck = FPNP5(filters=32, min_level=3, max_level=7, backbone_max_level=5,
                 use_bias_before_bn=True)
    v = neck.init(jax.random.PRNGKey(0), _features(), train=False)
    for lvl in range(3, 8):
        assert "bias" in v["params"][f"p{lvl}_out_conv"]["conv"]


def test_build_neck_wires_use_bias_before_bn():
    """conv_2d.use_bias_before_bn must reach the necks that consume it
    (reference multi_level_attention_fusion.py:71, fpn_p5.py:82)."""
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.models.retinanet import build_neck

    def make(neck_type, bias):
        params = from_dict({
            "experiment": {"name": "t"},
            "input": {"input_shape": [128, 128], "channels": 3},
            "architecture": {
                "conv_2d": {"use_bias_before_bn": bias},
                "backbone": {"type": "resnet", "depth": 18},
                "feature_fusion": {
                    "type": neck_type, "filters": 32, "min_level": 3,
                    "max_level": 7, "backbone_max_level": 5},
                "head": {"num_convs": 1, "filters": 32, "num_classes": 4,
                         "num_anchors": 9},
            },
        })
        arch = params.architecture
        return build_neck(arch, arch.conv_2d, arch.batch_norm,
                          jax.nn.relu, jnp.float32)

    for neck_type in ("fpn_p5", "multi_level_attention",
                      "stacked_multi_level_attention"):
        assert make(neck_type, True).use_bias_before_bn is True
        assert make(neck_type, False).use_bias_before_bn is False


def test_balance_features_preserves_shapes():
    bf = BalanceFeatures(min_level=3, max_level=5, intermediate_level=4)
    feats = {k: jnp.ones((1, s, s, 32))
             for k, s in (("3", 16), ("4", 8), ("5", 4))}
    v = bf.init(jax.random.PRNGKey(0), feats)
    out = bf.apply(v, feats)
    for k in feats:
        assert out[k].shape == feats[k].shape
    # redistribution adds the averaged feature: values change
    assert not jnp.allclose(out["3"], feats["3"])
