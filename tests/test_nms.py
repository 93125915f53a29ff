"""NMS + postprocessing: index-level parity with the TF ops the reference
uses (tf.image.non_max_suppression / tf.raw_ops.NonMaxSuppressionV5,
reference postprocessing_ops.py:244-432)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.ops import postprocess
from retinanet_tpu.ops.nms import nms_select

tf = pytest.importorskip("tensorflow")


def _random_boxes(rng, k):
    xy = rng.uniform(0, 0.8, (k, 2))
    wh = rng.uniform(0.05, 0.3, (k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32).clip(0, 1)
    scores = rng.uniform(0, 1, k).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("trial", range(3))
def test_hard_nms_matches_tf(trial):
    rng = np.random.default_rng(trial)
    boxes, scores = _random_boxes(rng, 150)
    sel_tf = tf.image.non_max_suppression(
        boxes[:, [1, 0, 3, 2]], scores, 40,
        iou_threshold=0.5, score_threshold=0.1).numpy()
    res = nms_select(jnp.asarray(boxes), jnp.asarray(scores), 40,
                     iou_threshold=0.5, score_threshold=0.1)
    ours = np.asarray(res.indices)[:int(res.valid)]
    np.testing.assert_array_equal(ours, sel_tf)


@pytest.mark.parametrize("sigma", [0.25, 0.5])
def test_soft_nms_matches_tf_v5(sigma):
    rng = np.random.default_rng(7)
    boxes, scores = _random_boxes(rng, 150)
    sel, sc, n = tf.raw_ops.NonMaxSuppressionV5(
        boxes=boxes[:, [1, 0, 3, 2]], scores=scores, max_output_size=40,
        iou_threshold=1.0, score_threshold=0.1, soft_nms_sigma=sigma,
        pad_to_max_output_size=True)
    res = nms_select(jnp.asarray(boxes), jnp.asarray(scores), 40,
                     iou_threshold=1.0, score_threshold=0.1,
                     soft_nms_sigma=sigma, soft=True)
    n_ours = int(res.valid)
    assert n_ours == int(n)
    np.testing.assert_array_equal(
        np.asarray(res.indices)[:n_ours], sel.numpy()[:n_ours])
    np.testing.assert_allclose(
        np.asarray(res.scores)[:n_ours], sc.numpy()[:n_ours],
        rtol=1e-4, atol=1e-6)


def test_nms_empty_scores():
    boxes = jnp.zeros((10, 4))
    scores = jnp.zeros((10,))
    res = nms_select(boxes, scores, 5, score_threshold=0.1)
    assert int(res.valid) == 0


# ---------------------------------------------------------------------------
# postprocess pipeline
# ---------------------------------------------------------------------------

def _decoded(rng, b=2, a=100, c=5):
    scores = rng.uniform(0, 1, (b, a, c)).astype(np.float32)
    xy = rng.uniform(0.1, 0.8, (b, a, 2))
    wh = rng.uniform(0.05, 0.2, (b, a, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    return {"scores": jnp.asarray(scores), "boxes": jnp.asarray(boxes)}


@pytest.mark.parametrize("mode", postprocess.NMS_MODES)
def test_generate_detections_modes(mode):
    rng = np.random.default_rng(3)
    det = _decoded(rng)
    if "PerClass" in mode or mode == "CombinedNMS":
        det = postprocess.filter_top_k(det, top_k=50, filter_per_class=True)
    out = postprocess.generate_detections(
        det, mode=mode, num_classes=5, max_detections=10,
        iou_threshold=0.5, score_threshold=0.3, soft_nms_sigma=0.5)
    assert out["scores"].shape == (2, 10)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["classes"].shape == (2, 10)
    assert out["valid_detections"].shape == (2,)
    v = np.asarray(out["valid_detections"])
    s = np.asarray(out["scores"])
    c = np.asarray(out["classes"])
    for i in range(2):
        assert np.all(s[i, :v[i]] > 0.3)
        assert np.all(s[i, v[i]:] == -1.0)
        assert np.all(c[i, v[i]:] == -1)
        assert np.all((c[i, :v[i]] >= 0) & (c[i, :v[i]] < 5))
        # scores sorted descending among valid
        assert np.all(np.diff(s[i, :v[i]]) <= 1e-6)


def test_decode_round_trip():
    """Encoding GT boxes with the label-encoder transform then decoding
    through postprocess must reproduce the boxes."""
    from retinanet_tpu.data.anchors import AnchorGenerator
    gen = AnchorGenerator(64, 64, 3, 5, [1024.0, 4096.0, 16384.0],
                          [0.5, 1.0, 2.0], [1.0, 2 ** (1 / 3), 2 ** (2 / 3)])
    anchors = jnp.asarray(gen.boxes)
    rng = np.random.default_rng(0)
    n = gen.total_anchors
    gt_xy = rng.uniform(10, 50, (n, 2)).astype(np.float32)
    gt_wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
    gt = jnp.asarray(np.concatenate([gt_xy, gt_wh], -1))
    encoded = jnp.concatenate([
        (gt[:, :2] - anchors[:, :2]) / anchors[:, 2:],
        jnp.log(gt[:, 2:] / anchors[:, 2:])], -1)
    fused = {"class_logits": jnp.zeros((1, n, 3)),
             "encoded_boxes": encoded[None]}
    out = postprocess.decode_detections(fused, gen, (64, 64))
    boxes = np.asarray(out["boxes"][0]) * 64.0  # back to pixels
    xywh = np.concatenate([
        (boxes[:, :2] + boxes[:, 2:]) / 2, boxes[:, 2:] - boxes[:, :2]], -1)
    np.testing.assert_allclose(xywh, np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_fuse_predictions_shapes():
    preds = {
        "class-predictions": {
            "3": jnp.zeros((2, 8, 8, 45)), "4": jnp.zeros((2, 4, 4, 45))},
        "box-predictions": {
            "3": jnp.zeros((2, 8, 8, 36)), "4": jnp.zeros((2, 4, 4, 36))},
    }
    fused = postprocess.fuse_predictions(preds, 3, 4)
    assert fused["class_logits"].shape == (2, (64 + 16) * 9, 5)
    assert fused["encoded_boxes"].shape == (2, (64 + 16) * 9, 4)
