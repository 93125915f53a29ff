"""EfficientNet / MobileDet backbones: exact param-count parity with the
reference implementations (counts captured by instantiating
/root/reference/retinanet/model/backbone/{efficientnet,mobiledet}.py via
tf_keras; see tools/generate_goldens.py workflow)."""

import jax
import jax.numpy as jnp
import pytest

from retinanet_tpu.models.efficientnet import EfficientNet
from retinanet_tpu.models.mobiledet import MobileDet

# (trainable, batch_stats) from the reference at 256x256
EFFICIENTNET_COUNTS = {
    "efficientnet-b0": (3_595_388, 39_456),
    "efficientnet-b2": (7_202_562, 64_752),
    "efficientnet-lite0": (2_958_848, 39_456),
}
MOBILEDET_COUNTS = {
    "mobiledet_cpu": (3_021_584, 30_288),
    "mobiledet_dsp": (5_863_208, 46_512),
    "mobiledet_edge_tpu": (2_796_248, 38_416),
    "mobiledet_gpu": (11_704_240, 28_640),
}


def _counts(model):
    x = jnp.zeros((1, 256, 256, 3))
    v = jax.eval_shape(
        lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    s = sum(p.size for p in jax.tree_util.tree_leaves(v["batch_stats"]))
    return n, s


@pytest.mark.parametrize("name", sorted(EFFICIENTNET_COUNTS))
def test_efficientnet_param_parity(name):
    assert _counts(EfficientNet.from_name(name)) == EFFICIENTNET_COUNTS[name]


@pytest.mark.parametrize("name", sorted(MOBILEDET_COUNTS))
def test_mobiledet_param_parity(name):
    assert _counts(MobileDet(variant=name)) == MOBILEDET_COUNTS[name]


def test_efficientnet_forward_endpoints():
    model = EfficientNet.from_name("efficientnet-b0")
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert set(out) == {"2", "3", "4", "5"}
    for lvl, feat in out.items():
        assert feat.shape[1] == 128 // 2 ** int(lvl)


def test_mobiledet_forward_endpoints():
    model = MobileDet(variant="mobiledet_edge_tpu")
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert set(out) == {"1", "2", "3", "4", "5"}
    for lvl, feat in out.items():
        assert feat.shape[1] == 128 // 2 ** int(lvl)


def test_efficientnet_in_full_model():
    from retinanet_tpu.core import config as cfg
    from retinanet_tpu.models.retinanet import build_model
    params = cfg.from_dict({
        "experiment": {"name": "t"},
        "input": {"input_shape": [128, 128], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "efficientnet-b0"},
            "feature_fusion": {"type": "fpn", "filters": 32, "min_level": 3,
                               "max_level": 7, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 32, "num_classes": 4,
                     "num_anchors": 9},
        },
    })
    model = build_model(params)
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["box-predictions"]["7"].shape == (1, 1, 1, 36)


def test_mobiledet_in_full_model():
    from retinanet_tpu.core import config as cfg
    from retinanet_tpu.models.retinanet import build_model
    params = cfg.from_dict({
        "experiment": {"name": "t"},
        "input": {"input_shape": [128, 128], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "conv_2d": {"use_seperable_conv": True,
                        "use_bias_before_bn": False},
            "backbone": {"type": "mobiledet_edge_tpu"},
            "feature_fusion": {"type": "fpn", "filters": 64, "min_level": 3,
                               "max_level": 6, "backbone_max_level": 5,
                               "use_balanced_features": True},
            "head": {"num_convs": 1, "filters": 64, "num_classes": 4,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0, 65536.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
    })
    model = build_model(params)
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out["box-predictions"]["6"].shape == (1, 2, 2, 36)
