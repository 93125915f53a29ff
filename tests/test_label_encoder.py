"""Label encoder vs goldens from the reference implementation
(reference retinanet/dataloader/label_encoder.py:8-125)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data import label_encoder
from retinanet_tpu.data.anchors import AnchorGenerator

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


@pytest.fixture(scope="module")
def small_anchors():
    return AnchorGenerator(
        64, 64, 3, 5, [1024.0, 4096.0, 16384.0], [0.5, 1.0, 2.0],
        [1.0, 2 ** (1 / 3), 2 ** (2 / 3)])


def _pad(gt_xywh, gt_cls, max_boxes=20):
    n = len(gt_xywh)
    boxes = np.zeros((max_boxes, 4), np.float32)
    classes = np.zeros((max_boxes,), np.int32)
    valid = np.zeros((max_boxes,), bool)
    boxes[:n], classes[:n], valid[:n] = gt_xywh, gt_cls, True
    return boxes, classes, valid


def test_encode_matches_reference(goldens, small_anchors):
    boxes, classes, valid = _pad(goldens["gt_xywh"], goldens["gt_cls"])
    enc = label_encoder.encode(
        jnp.asarray(small_anchors.boxes), jnp.asarray(boxes),
        jnp.asarray(classes), jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(enc.cls_target), goldens["cls_target"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(enc.box_target), goldens["box_target"],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(enc.iou_target), goldens["iou_target"],
        rtol=1e-4, atol=1e-4)
    assert float(enc.num_positives) == float(goldens["num_positives"])


def test_encode_no_gt(small_anchors):
    boxes = jnp.zeros((10, 4), jnp.float32)
    classes = jnp.zeros((10,), jnp.int32)
    valid = jnp.zeros((10,), bool)
    enc = label_encoder.encode(
        jnp.asarray(small_anchors.boxes), boxes, classes, valid)
    assert float(enc.num_positives) == 0.0
    np.testing.assert_array_equal(np.asarray(enc.cls_target), -1.0)
    np.testing.assert_array_equal(np.asarray(enc.box_target), 0.0)
    np.testing.assert_array_equal(np.asarray(enc.iou_target), -1.0)


def test_force_match_every_gt(small_anchors):
    """Every valid GT must claim at least one anchor even at low IoU."""
    gt = np.array([[32.0, 32.0, 2.0, 2.0]], np.float32)  # tiny box
    boxes, classes, valid = _pad(gt, np.array([3], np.int32))
    enc = label_encoder.encode(
        jnp.asarray(small_anchors.boxes), jnp.asarray(boxes),
        jnp.asarray(classes), jnp.asarray(valid))
    assert float(enc.num_positives) >= 1.0
    assert (np.asarray(enc.cls_target) == 3.0).sum() >= 1


def test_pyramid_reshape_roundtrip(goldens, small_anchors):
    boxes, classes, valid = _pad(goldens["gt_xywh"], goldens["gt_cls"])
    encode_fn = label_encoder.make_batched_encoder(
        small_anchors,
        cfg.from_dict(_min_cfg()).encoder_params,
        use_iou_targets=True)
    targets = jax.jit(encode_fn)(
        jnp.asarray(boxes)[None], jnp.asarray(classes)[None],
        jnp.asarray(valid)[None])
    assert set(targets["class-targets"]) == {"3", "4", "5"}
    assert targets["class-targets"]["3"].shape == (1, 8, 8, 9)
    assert targets["box-targets"]["5"].shape == (1, 2, 2, 36)
    # flatten back and compare with the flat encoding
    flat = jnp.concatenate(
        [targets["class-targets"][k].reshape(1, -1) for k in "345"], axis=1)
    np.testing.assert_allclose(
        np.asarray(flat)[0], goldens["cls_target"], atol=1e-5)


def _min_cfg():
    return {
        "experiment": {"name": "t"},
        "input": {"input_shape": [64, 64], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 50},
            "feature_fusion": {"type": "fpn", "filters": 64,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 64,
                     "num_classes": 10, "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
    }
