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
