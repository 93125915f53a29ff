"""Pallas NMS kernel vs the XLA reference (interpret mode on CPU; the same
comparison runs compiled on real TPU via tools/verify_pallas_tpu.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.ops.nms import nms_select
from retinanet_tpu.ops.pallas.nms_kernel import pallas_nms


def _lanes(rng, lanes, k):
    xy = rng.uniform(0, 0.8, (lanes, k, 2))
    wh = rng.uniform(0.02, 0.3, (lanes, k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32).clip(0, 1)
    scores = rng.uniform(0, 1, (lanes, k)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("soft,sigma", [(False, 0.0), (True, 0.25)])
def test_pallas_matches_xla(soft, sigma):
    rng = np.random.default_rng(0)
    boxes, scores = _lanes(rng, 11, 150)
    idx, sc, valid = pallas_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 30,
        iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
        soft_nms_sigma=sigma, soft=soft, interpret=True)
    for lane in range(boxes.shape[0]):
        ref = nms_select(
            jnp.asarray(boxes[lane]), jnp.asarray(scores[lane]), 30,
            iou_threshold=1.0 if soft else 0.5, score_threshold=0.1,
            soft_nms_sigma=sigma, soft=soft)
        n = int(ref.valid)
        assert int(valid[lane]) == n
        np.testing.assert_array_equal(
            np.asarray(idx[lane])[:n], np.asarray(ref.indices)[:n])
        np.testing.assert_allclose(
            np.asarray(sc[lane])[:n], np.asarray(ref.scores)[:n],
            rtol=1e-5, atol=1e-6)


def test_pallas_padding_lanes_and_candidates():
    """Lane count not a multiple of the block, k not a multiple of 128."""
    rng = np.random.default_rng(2)
    boxes, scores = _lanes(rng, 3, 77)
    idx, sc, valid = pallas_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 10,
        iou_threshold=0.5, score_threshold=0.2, interpret=True)
    assert idx.shape == (3, 10)
    for lane in range(3):
        ref = nms_select(jnp.asarray(boxes[lane]), jnp.asarray(scores[lane]),
                         10, iou_threshold=0.5, score_threshold=0.2)
        assert int(valid[lane]) == int(ref.valid)


def test_pallas_all_below_threshold():
    boxes = jnp.zeros((2, 64, 4))
    scores = jnp.full((2, 64), 0.01)
    idx, sc, valid = pallas_nms(boxes, scores, 5, score_threshold=0.5,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(valid), [0, 0])
    np.testing.assert_array_equal(np.asarray(sc), -1.0)
