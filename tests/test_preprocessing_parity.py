"""Pixel/box parity of HostPreprocessor vs the EXECUTED reference pipeline.

Goldens in tests/goldens/preprocessing_goldens.npz are produced by
tools/generate_preprocessing_goldens.py, which imports and runs the
reference PreprocessingPipeline (reference
retinanet/dataloader/preprocessing_pipeline.py:13-129) on a corpus of
non-square / odd / up- and down-scaled images, with the train path's three
tf.random.uniform draws pinned so this test can replay identical geometry.

The reference normalizes first and zero-pads; HostPreprocessor does the
geometry in the raw pixel domain, mean-pads, and normalizes on device —
affine normalization commutes with bilinear resampling, so post-
normalization outputs must agree:
  * float32 lane: <= 1 uint8 LSB post-normalization (1/128 for the
    shipped mean=127/stddev=128 constants)
  * uint8 lane: adds one quantization round -> <= 3 LSB
  * resize_scale / boxes / classes: exact (float32 tolerances)
"""

import os

import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.data.preprocessing import HostPreprocessor

GOLDENS = os.path.join(
    os.path.dirname(__file__), "goldens", "preprocessing_goldens.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDENS), reason="preprocessing goldens not generated")


@pytest.fixture(scope="module")
def g():
    return dict(np.load(GOLDENS, allow_pickle=False).items())


def _params(g, use_augmentation):
    target = int(g["target"])
    return cfg.from_dict({
        "experiment": {"name": "pp"},
        "input": {"input_shape": [target, target], "channels": 3},
        "architecture": {
            "backbone": {"type": "resnet", "depth": 10},
            "feature_fusion": {"type": "fpn", "filters": 16,
                               "min_level": 3, "max_level": 5,
                               "backbone_max_level": 5},
            "head": {"num_convs": 1, "filters": 16, "num_classes": 6,
                     "num_anchors": 9},
        },
        "anchor_params": {"areas": [1024.0, 4096.0, 16384.0],
                          "aspect_ratios": [0.5, 1.0, 2.0],
                          "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
        "training": {"batch_size": {"train": 1, "val": 1},
                     "train_steps": 1, "save_every": 1,
                     "optimizer": {
                         "name": "sgd",
                         "lr_params": {
                             "schedule_type": "piecewise_constant_decay",
                             "warmup_learning_rate": 0.001,
                             "warmup_steps": 1, "values": [0.01],
                             "boundaries": []}}},
        "dataloader_params": {
            "preprocessing": {
                "mean": [float(m) for m in g["mean"]],
                "stddev": [float(s) for s in g["stddev"]],
                "pixel_scale": float(g["pixel_scale"]),
            },
            "augmentations": {
                "use_augmentation": use_augmentation,
                "horizontal_flip": use_augmentation,
                "scale_jitter": {"min_scale": float(g["jitter"][0]),
                                 "max_scale": float(g["jitter"][1])},
            },
            "shuffle_buffer_size": 4},
    })


def _normalize(img, g):
    mean = g["mean"].reshape(1, 1, 3)
    std = g["stddev"].reshape(1, 1, 3)
    return (img.astype(np.float32) / float(g["pixel_scale"]) - mean) / std


class _PinnedRng:
    """Replays the reference's pinned draws through HostPreprocessor's rng
    protocol (flip scalar, scale scalar already in [min,max], offset pair)."""

    def __init__(self, draws):
        flip, scale, oy, ox = [float(d) for d in draws]
        self._queue = [np.float64(flip), np.float64(scale),
                       np.array([oy, ox], np.float64)]

    def uniform(self, low=0.0, high=1.0, size=None):
        return self._queue.pop(0)


LSB = 1.0 / 128.0  # one uint8 step post-normalization (stddev=128)


# ---------------------------------------------------------------------------
# val path: normalize_and_resize_with_pad (reference :96-129)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("i", range(10))
def test_val_pixels_float32_lane(g, i):
    pre = HostPreprocessor(_params(g, False), image_dtype=np.float32)
    img = g[f"val{i}_img_u8"]
    out, scale = pre.resize_with_pad(img.astype(np.float32))
    ours = _normalize(out, g)
    ref = g[f"val{i}_image"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(scale, g[f"val{i}_scale"], rtol=1e-6)
    err = np.abs(ours - ref)
    assert err.max() <= LSB + 1e-5, (
        f"val shape {img.shape}: max err {err.max():.5f} "
        f"({err.max() / LSB:.2f} LSB) at {np.unravel_index(err.argmax(), err.shape)}")


@pytest.mark.parametrize("i", range(10))
def test_val_pixels_uint8_lane(g, i):
    pre = HostPreprocessor(_params(g, False), image_dtype=np.uint8)
    img = g[f"val{i}_img_u8"]
    out, scale = pre.resize_with_pad(img)
    ours = _normalize(out, g)
    ref = g[f"val{i}_image"]
    np.testing.assert_allclose(scale, g[f"val{i}_scale"], rtol=1e-6)
    err = np.abs(ours - ref)
    assert err.max() <= 3 * LSB + 1e-5, (
        f"val shape {img.shape}: max err {err.max() / LSB:.2f} LSB")


# ---------------------------------------------------------------------------
# train path: flip + jitter resize + crop/pad + box transform (:13-94)
# ---------------------------------------------------------------------------

def _run_train(g, i, image_dtype):
    pre = HostPreprocessor(_params(g, True), max_boxes=20,
                           image_dtype=image_dtype)
    img = g[f"tr{i}_img_u8"]
    if image_dtype is np.float32:
        img = img.astype(np.float32)
    out = pre(img, g[f"tr{i}_boxes_norm"], g[f"tr{i}_cls_in"],
              _PinnedRng(g[f"tr{i}_draws"]))
    return out


@pytest.mark.parametrize("i", range(10))
def test_train_geometry_boxes_classes(g, i):
    out = _run_train(g, i, np.float32)
    ref_boxes = g[f"tr{i}_boxes"]
    ref_cls = g[f"tr{i}_cls"]
    n = int(out["valid"].sum())
    assert n == len(ref_boxes), (
        f"kept {n} boxes, reference kept {len(ref_boxes)}")
    # box transform is pure float math on identical draws -> tight
    np.testing.assert_allclose(
        out["boxes"][:n], ref_boxes, rtol=1e-5, atol=2e-3)
    np.testing.assert_array_equal(out["classes"][:n], ref_cls)


@pytest.mark.parametrize("i", range(10))
def test_train_pixels_float32_lane(g, i):
    out = _run_train(g, i, np.float32)
    ours = _normalize(out["image"], g)
    ref = g[f"tr{i}_image"]
    assert ours.shape == ref.shape
    err = np.abs(ours - ref)
    assert err.max() <= LSB + 1e-5, (
        f"train case {i}: max err {err.max() / LSB:.2f} LSB at "
        f"{np.unravel_index(err.argmax(), err.shape)}")


@pytest.mark.parametrize("i", range(10))
def test_train_pixels_uint8_lane(g, i):
    out = _run_train(g, i, np.uint8)
    ours = _normalize(out["image"], g)
    ref = g[f"tr{i}_image"]
    err = np.abs(ours - ref)
    assert err.max() <= 3 * LSB + 1e-5, (
        f"train case {i}: max err {err.max() / LSB:.2f} LSB")
