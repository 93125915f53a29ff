"""Loss numerics vs goldens from the reference implementation
(reference retinanet/losses/loss_impl.py, retinanet_loss.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.losses.losses import (
    RetinaNetLoss, huber_loss, sigmoid_focal_loss)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "loss_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def test_focal_matches_reference(goldens):
    loss = sigmoid_focal_loss(
        jnp.asarray(goldens["logits"]), jnp.asarray(goldens["y"]),
        alpha=0.25, gamma=1.5, label_smoothing=0.0)
    total = float(jnp.sum(loss * jnp.asarray(goldens["w"])))
    np.testing.assert_allclose(total, float(goldens["focal_sum"]), rtol=1e-5)


def test_huber_matches_reference(goldens):
    bt = jnp.asarray(goldens["bt"])[..., 0]
    bp = jnp.asarray(goldens["bp"])[..., 0]
    mask = (bt != 0.0).astype(jnp.float32)
    total = float(jnp.sum(huber_loss(bt, bp, delta=0.1) * mask))
    np.testing.assert_allclose(total, float(goldens["huber_sum"]), rtol=1e-5)


def _loss_params():
    return cfg.from_dict({
        "experiment": {"name": "t"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 50},
            "feature_fusion": {"type": "fpn", "min_level": 3, "max_level": 5,
                               "filters": 64, "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 64, "num_classes": 8,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
    }).loss


def test_retinanet_loss_shapes_and_normalizer():
    rng = np.random.default_rng(0)
    num_classes, a = 8, 9
    targets = {
        "class-targets": {}, "box-targets": {},
        "num-positives": jnp.asarray([5.0, 3.0]),
    }
    predictions = {"class-predictions": {}, "box-predictions": {}}
    for lvl, hw in (("3", 8), ("4", 4), ("5", 2)):
        cls_t = rng.integers(-2, num_classes, size=(2, hw, hw, a))
        targets["class-targets"][lvl] = jnp.asarray(cls_t, jnp.float32)
        targets["box-targets"][lvl] = jnp.asarray(
            rng.normal(size=(2, hw, hw, 4 * a))
            * (rng.uniform(size=(2, hw, hw, 4 * a)) > 0.7), jnp.float32)
        predictions["class-predictions"][lvl] = jnp.asarray(
            rng.normal(size=(2, hw, hw, a * num_classes)), jnp.float32)
        predictions["box-predictions"][lvl] = jnp.asarray(
            rng.normal(size=(2, hw, hw, 4 * a)), jnp.float32)

    loss_fn = RetinaNetLoss(num_classes, _loss_params())
    losses, ema = loss_fn(targets, predictions)
    assert ema is None
    # normalizer = sum(num_positives) + 1
    np.testing.assert_allclose(float(losses["num-anchors-matched"]), 9.0)
    expected = 50.0 * float(losses["box-loss"]) + float(losses["class-loss"])
    np.testing.assert_allclose(
        float(losses["weighted-loss"]), expected, rtol=1e-6)
    assert float(losses["class-loss"]) > 0.0
    assert float(losses["box-loss"]) > 0.0


def test_moving_average_normalizer():
    params = _loss_params()
    params.normalizer.use_moving_average = True
    loss_fn = RetinaNetLoss(8, params)
    targets = {
        "class-targets": {"3": jnp.full((1, 2, 2, 9), -1.0)},
        "box-targets": {"3": jnp.zeros((1, 2, 2, 36))},
        "num-positives": jnp.asarray([9.0]),
    }
    predictions = {
        "class-predictions": {"3": jnp.zeros((1, 2, 2, 72))},
        "box-predictions": {"3": jnp.zeros((1, 2, 2, 36))},
    }
    losses, ema = loss_fn(targets, predictions,
                          normalizer_ema=jnp.float32(0.0))
    # ema = 0 * 0.99 + 10 * 0.01
    np.testing.assert_allclose(float(ema), 0.1, rtol=1e-6)


def test_class_loss_analytic_vjp_matches_autodiff():
    """class_loss ships a hand-derived backward (no full-size residuals);
    pin it against autodiff of the same forward expression."""
    import jax
    from retinanet_tpu.losses.losses import class_loss, sigmoid_focal_loss

    rng = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(rng)
    nc = 8
    targets = {"3": jnp.asarray(
        jax.random.randint(k1, (2, 4, 4, 9), -2, nc), jnp.float32)}
    preds = {"3": jax.random.normal(k2, (2, 4, 4, 9 * nc), jnp.float32) * 3}

    for ls in (0.0, 0.1):
        def via_onehot(p):
            tgt = targets["3"]
            logits = p["3"].reshape(2, 4, 4, 9, nc)
            one_hot = jax.nn.one_hot(tgt.astype(jnp.int32), nc)
            loss = sigmoid_focal_loss(logits, one_hot, 0.25, 1.5, ls)
            ignore = (tgt != -2.0).astype(jnp.float32)[..., None]
            return jnp.sum(loss * ignore)

        def via_class_loss(p):
            return class_loss(targets, p, nc, 0.25, 1.5, ls)

        v1, g1 = jax.value_and_grad(via_onehot)(preds)
        v2, g2 = jax.value_and_grad(via_class_loss)(preds)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1["3"]), np.asarray(g2["3"]),
                                   atol=2e-5)


def test_class_loss_grad_with_extra_prediction_level():
    """Predictions may carry levels absent from the targets (e.g. a
    frozen/aux head); the custom VJP must return zero cotangents for
    them instead of failing structure checks."""
    import jax
    from retinanet_tpu.losses.losses import class_loss

    rng = jax.random.PRNGKey(0)
    targets = {"3": jnp.zeros((1, 2, 2, 9), jnp.float32) - 1.0}
    preds = {"3": jax.random.normal(rng, (1, 2, 2, 9 * 8), jnp.float32),
             "4": jax.random.normal(rng, (1, 1, 1, 9 * 8), jnp.float32)}
    g = jax.grad(lambda p: class_loss(targets, p, 8, 0.25, 1.5, 0.0))(preds)
    assert g["3"].shape == preds["3"].shape
    assert np.all(np.asarray(g["4"]) == 0.0)
