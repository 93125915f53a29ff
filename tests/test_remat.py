"""backbone.remat: nn.remat'd ResNet blocks must be a pure memory policy —
identical params, identical forward outputs, identical loss/grads; the
FLOPs-for-HBM trade that lets high-res configs (the reference's
1280x1280 corpus entry) fit a useful per-chip batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.models.retinanet import build_model


def _params(remat):
    return cfg.from_dict({
        "experiment": {"name": "remat_test"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "floatx": {"precision": "float32"},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 18, "remat": remat},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 4,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
    })


def test_remat_is_numerically_invisible():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    model_a = build_model(_params(False))
    model_b = build_model(_params(True))
    va = model_a.init(key, x[:1], train=False)
    vb = model_b.init(key, x[:1], train=False)

    # identical parameter tree (names and values): lifted transform only
    ta = jax.tree_util.tree_structure(va)
    tb = jax.tree_util.tree_structure(vb)
    assert ta == tb
    jax.tree_util.tree_map(np.testing.assert_array_equal, va, vb)

    def loss(model, v):
        def f(p):
            preds, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return sum(jnp.sum(m.astype(jnp.float32) ** 2)
                       for d in preds.values() for m in d.values())
        return jax.value_and_grad(f)(v["params"])

    la, ga = jax.jit(lambda v: loss(model_a, v))(va)
    lb, gb = jax.jit(lambda v: loss(model_b, v))(vb)
    assert float(la) == pytest.approx(float(lb), rel=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda p, q: float(jnp.max(jnp.abs(p - q))), ga, gb)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_remat_rejected_for_unsupported_backbone():
    p = _params(True)
    p.architecture.backbone = cfg.ConfigDict(
        {"type": "mobiledet", "model_name": "cpu", "remat": True})
    with pytest.raises(ValueError, match="remat"):
        build_model(p)
