"""Non-maximum suppression, XLA/TPU-native.

Semantic parity with the reference's five modes (reference
retinanet/model/layers/postprocessing_ops.py:177-561): CombinedNMS,
GlobalSoftNMS, GlobalHardNMS, PerClassSoftNMS, PerClassHardNMS — but ONE
TPU-first algorithm instead of five TF C++ ops:

  Greedy NMS picks at most `max_detections` boxes. We run exactly that
  selection as a `lax.scan` of select-argmax -> suppress steps. Each step
  computes one IoU row (selected box vs all k candidates) on the fly —
  O(max_det * k) fused VPU work, no k x k IoU matrix, no dynamic shapes,
  identical tie-breaking to the sequential reference algorithm
  (tf NonMaxSuppressionV5 / non_max_suppression_padded pick in score order,
  first-index-wins on ties — jnp.argmax also returns the first maximum).

  * hard NMS: suppress candidates with IoU > iou_threshold
  * soft NMS: rescale scores by exp(-iou^2 / soft_nms_sigma); following
    tf.raw_ops.NonMaxSuppressionV5 the reference passes sigma/2 and uses
    iou_threshold=1.0 (reference postprocessing_ops.py:244-262) — callers
    here do the same.

Boxes are [x1, y1, x2, y2] (any consistent corner order works since IoU is
symmetric in the coordinates).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e10


class NMSResult(NamedTuple):
    indices: jnp.ndarray   # (max_det,) int32 into the candidate axis
    scores: jnp.ndarray    # (max_det,) float32; -inf-ish for empty slots
    valid: jnp.ndarray     # () int32 number of selections >= score_threshold


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one corner box against (k, 4) corner boxes."""
    lu = jnp.maximum(box[:2], boxes[:, :2])
    rd = jnp.minimum(box[2:], boxes[:, 2:])
    inter = jnp.maximum(0.0, rd - lu)
    inter_area = inter[:, 0] * inter[:, 1]
    area1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(
        box[3] - box[1], 0.0)
    area2 = (jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
             * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0))
    union = jnp.maximum(area1 + area2 - inter_area, 1e-8)
    return inter_area / union


@partial(jax.jit, static_argnames=(
    "max_detections", "iou_threshold", "score_threshold", "soft_nms_sigma",
    "soft"))
def nms_select(boxes: jnp.ndarray,
               scores: jnp.ndarray,
               max_detections: int,
               iou_threshold: float = 0.5,
               score_threshold: float = float("-inf"),
               soft_nms_sigma: float = 0.0,
               soft: bool = False) -> NMSResult:
    """Greedy (soft-)NMS over (k, 4) boxes / (k,) scores.

    Exact sequential semantics; vmap over batch and/or classes for the
    batched modes.
    """
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)

    def body(carry, _):
        cur_scores = carry
        idx = jnp.argmax(cur_scores)
        best = cur_scores[idx]
        ok = best > score_threshold
        iou = _iou_one_vs_all(boxes[idx], boxes)
        if soft:
            # NonMaxSuppressionV5 kernel: scale = exp(-iou^2 / (2*sigma))
            # for sigma>0 (verified empirically against tf.raw_ops, so the
            # reference's sigma/2 convention reproduces the paper's
            # exp(-iou^2/sigma)); boxes past iou_threshold are zeroed.
            if soft_nms_sigma > 0.0:
                scale = jnp.exp(-(iou * iou) / (2.0 * soft_nms_sigma))
                scale = jnp.where(iou > iou_threshold, 0.0, scale)
            else:
                scale = (iou <= iou_threshold).astype(jnp.float32)
            new_scores = cur_scores * scale
        else:
            new_scores = jnp.where(iou > iou_threshold, _NEG_INF, cur_scores)
        new_scores = new_scores.at[idx].set(_NEG_INF)
        new_scores = jnp.where(ok, new_scores, cur_scores)
        out_idx = jnp.where(ok, idx, -1)
        out_score = jnp.where(ok, best, -1.0)
        return new_scores, (out_idx.astype(jnp.int32), out_score)

    _, (indices, out_scores) = jax.lax.scan(
        body, scores, None, length=max_detections)
    valid = jnp.sum((indices >= 0).astype(jnp.int32))
    return NMSResult(jnp.maximum(indices, 0), out_scores, valid)


def batched_nms(boxes: jnp.ndarray,
                scores: jnp.ndarray,
                max_detections: int,
                iou_threshold: float = 0.5,
                score_threshold: float = float("-inf"),
                soft_nms_sigma: float = 0.0,
                soft: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """vmap of nms_select over a leading batch axis.

    boxes: (B, k, 4); scores: (B, k). Returns (indices (B, max_det),
    scores (B, max_det), valid (B,)).
    """
    fn = jax.vmap(lambda b, s: nms_select(
        b, s, max_detections, iou_threshold, score_threshold,
        soft_nms_sigma, soft))
    res = fn(boxes, scores)
    return res.indices, res.scores, res.valid
