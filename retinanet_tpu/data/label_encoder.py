"""Anchor-matching label encoder as a pure, jit-able JAX function.

Semantics match reference retinanet/dataloader/label_encoder.py:8-125, but
re-designed TPU-first: instead of running per-sample on host CPU inside
tf.data (the reference's per-sample cost center — an O(num_gt x ~76k-anchor)
IoU matrix, see reference label_encoder.py:31-55), we operate on *padded*
ground-truth (max_boxes rows + validity mask) so the whole batch encodes as
one fused XLA program on device, typically inside the jitted train step.

Matching rules (reference label_encoder.py:27-55):
  * matches[a] = argmax_g IoU(g, a)        if max_g IoU > match_iou
  * matches[a] = -2 (ignore)               if ignore_iou <= max IoU < match_iou
  * matches[a] = -1 (background)           otherwise
  * force-match: every valid GT claims its best anchor (ties: lowest GT index).

Box target (reference label_encoder.py:57-76):
  [(gt_xy - a_xy) / a_wh, log(gt_wh / a_wh)], optionally / box_variance;
  zeroed for non-positive anchors; gt box clamped to >= 1e-8 first.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple, Optional

import jax
import jax.numpy as jnp

from retinanet_tpu.data import box_utils
from retinanet_tpu.data.anchors import AnchorGenerator


class EncodedLabels(NamedTuple):
    """Flat per-anchor targets; split to pyramid levels via `to_pyramid`."""
    cls_target: jnp.ndarray    # (num_anchors,) float32: class id, -1 bg, -2 ignore
    box_target: jnp.ndarray    # (num_anchors, 4) float32
    iou_target: jnp.ndarray    # (num_anchors,) float32, -1 where unmatched
    num_positives: jnp.ndarray  # () float32


def _use_pallas_matcher() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _finish_matches(max_ious, matched_gt_idx, best_anchor_per_gt,
                    gt_valid, num_anchors, num_gt,
                    match_iou, ignore_iou):
    matches = jnp.where(max_ious > match_iou, matched_gt_idx, -1)
    matches = jnp.where(
        (max_ious >= ignore_iou) & (match_iou > max_ious), -2, matches)

    # Force-match: each valid GT claims its best anchor. With several GTs
    # claiming one anchor the lowest GT index wins (the reference builds a
    # (G, A) one-hot and argmaxes over G — label_encoder.py:44-54; argmax
    # returns the first/lowest index on ties). Formulated as a
    # broadcast-compare + reduce-min over the (A, G) space: XLA fuses it
    # into one VPU pass with nothing materialized. The previous scatter-min
    # (.at[best_anchor_per_gt].min) lowered to a serializing XLA:TPU
    # scatter measured at 9.1 ms/step (B=16) — the single hottest op in
    # the train step; this fused reduce is ~50x cheaper.
    gt_ids = jnp.arange(num_gt, dtype=jnp.int32)
    anchor_ids = jnp.arange(num_anchors, dtype=jnp.int32)
    claims = jnp.where(
        (best_anchor_per_gt.astype(jnp.int32)[None, :] == anchor_ids[:, None])
        & gt_valid[None, :],
        gt_ids[None, :], num_gt)                              # (A, G)
    forced = jnp.min(claims, axis=1)
    is_forced = forced < num_gt
    matches = jnp.where(is_forced, forced.astype(jnp.int32), matches)

    any_valid = jnp.any(gt_valid)
    matches = jnp.where(any_valid, matches, -1)
    return matches


def match_anchors(anchor_boxes: jnp.ndarray,
                  gt_boxes: jnp.ndarray,
                  gt_valid: jnp.ndarray,
                  match_iou: float,
                  ignore_iou: float,
                  use_pallas: Optional[bool] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (matches int32 (A,), max_ious float32 (A,)).

    gt_boxes: (G, 4) center-format, padded; gt_valid: (G,) bool.
    On TPU the IoU matrix + its three reductions run in a single-pass
    Pallas kernel (ops/pallas/matching_kernel.py); the XLA path is the
    portable reference.
    """
    if use_pallas is None:
        use_pallas = _use_pallas_matcher()
    num_anchors = anchor_boxes.shape[0]
    num_gt = gt_boxes.shape[0]

    if use_pallas:
        from retinanet_tpu.ops.pallas.matching_kernel import pallas_match
        max_ious, matched_gt_idx, _, best_anchor_per_gt = pallas_match(
            anchor_boxes, gt_boxes, gt_valid)
    else:
        iou = box_utils.compute_iou(gt_boxes, anchor_boxes, pairwise=True)
        # Invalid (padded) GT rows must never match nor force-match.
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        max_ious = jnp.max(iou, axis=0)
        matched_gt_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)
        best_anchor_per_gt = jnp.argmax(iou, axis=1)          # (G,)

    matches = _finish_matches(
        max_ious, matched_gt_idx, best_anchor_per_gt, gt_valid,
        num_anchors, num_gt, match_iou, ignore_iou)
    return matches, max_ious


def _box_target(anchor_boxes: jnp.ndarray,
                matched_gt_boxes: jnp.ndarray,
                matches: jnp.ndarray,
                box_variance,
                scale_box_targets: bool,
                eps: float = 1e-8) -> jnp.ndarray:
    gt = jnp.maximum(matched_gt_boxes, eps)
    target = jnp.concatenate([
        (gt[:, :2] - anchor_boxes[:, :2]) / anchor_boxes[:, 2:],
        jnp.log(gt[:, 2:] / anchor_boxes[:, 2:]),
    ], axis=-1)
    target = jnp.where((matches >= 0)[:, None], target, 0.0)
    if scale_box_targets:
        target = target / jnp.asarray(box_variance, dtype=jnp.float32)
    return target


def encode(anchor_boxes: jnp.ndarray,
           gt_boxes: jnp.ndarray,
           gt_classes: jnp.ndarray,
           gt_valid: jnp.ndarray,
           match_iou: float = 0.5,
           ignore_iou: float = 0.5,
           box_variance=(0.1, 0.1, 0.2, 0.2),
           scale_box_targets: bool = False,
           use_pallas: Optional[bool] = None) -> EncodedLabels:
    """Encode one sample. vmap over the batch for batched encoding.

    Args:
      anchor_boxes: (A, 4) center-format pixel anchors.
      gt_boxes: (G, 4) center-format pixel boxes, padded with zeros.
      gt_classes: (G,) int32 class ids.
      gt_valid: (G,) bool validity mask.
      use_pallas: force the Pallas (True) / XLA (False) matcher; None
        auto-selects (Pallas on TPU). A/B hook for
        tools/verify_pallas_tpu.py.
    """
    anchor_boxes = anchor_boxes.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)
    matches, _ = match_anchors(
        anchor_boxes, gt_boxes, gt_valid, match_iou, ignore_iou,
        use_pallas=use_pallas)

    # Gather of the tiny (G, 5) GT table by (A,) indices reformulated as a
    # one-hot matmul: XLA:TPU's dynamic gather measured 5.5 ms/step (B=16)
    # while the one-hot rides the MXU with the compare fused into the dot
    # operand. Rows with matches < 0 have an all-zero one-hot, which also
    # zeroes matched_boxes exactly like the previous where().
    gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
    one_hot = (matches[:, None] == gt_ids[None, :]).astype(jnp.float32)
    table = jnp.concatenate(
        [gt_boxes, gt_classes.astype(jnp.float32)[:, None]], axis=-1)
    gathered = one_hot @ table                                 # (A, 5)
    matched_boxes = gathered[:, :4]
    cls_target = jnp.where(
        matches >= 0, gathered[:, 4],
        matches.astype(jnp.float32))  # -1 / -2 sentinels pass through

    box_target = _box_target(anchor_boxes, matched_boxes, matches,
                             box_variance, scale_box_targets)

    iou_target = box_utils.compute_iou(
        anchor_boxes, matched_boxes, pairwise=False)
    iou_target = jnp.where(matches > -1, iou_target, -1.0)

    num_positives = jnp.sum((matches > -1).astype(jnp.float32))
    return EncodedLabels(cls_target, box_target, iou_target, num_positives)


def to_pyramid(encoded: EncodedLabels,
               anchors: AnchorGenerator,
               use_iou_targets: bool = False,
               batched: bool = True) -> Dict:
    """Reshape flat targets to per-level dense pyramids keyed '3'..'7'
    (reference label_encoder.py:106-124)."""
    targets = {"class-targets": {}, "box-targets": {}}
    if use_iou_targets:
        targets["iou-targets"] = {}
    a = anchors.num_anchors
    lead = (-1,) if batched else ()
    for i, lvl in enumerate(range(anchors.min_level, anchors.max_level + 1)):
        lo, hi = anchors.boundaries[i], anchors.boundaries[i + 1]
        fh, fw = anchors.feature_shapes[i]
        key = str(lvl)
        targets["class-targets"][key] = encoded.cls_target[..., lo:hi].reshape(
            *lead, fh, fw, a)
        targets["box-targets"][key] = encoded.box_target[..., lo:hi, :].reshape(
            *lead, fh, fw, 4 * a)
        if use_iou_targets:
            targets["iou-targets"][key] = encoded.iou_target[..., lo:hi].reshape(
                *lead, fh, fw, a)
    targets["num-positives"] = encoded.num_positives
    return targets


def make_batched_encoder(anchors: AnchorGenerator,
                         encoder_params,
                         use_iou_targets: bool = False,
                         use_pallas: Optional[bool] = None):
    """Returns fn(gt_boxes (B,G,4), gt_classes (B,G), gt_valid (B,G)) ->
    pyramid targets dict with batched leaves. Jit-safe; anchors are folded
    in as a compile-time constant. ``use_pallas`` forces the matcher lane
    (None = auto: Pallas on TPU)."""
    anchor_const = jnp.asarray(anchors.boxes)
    match_iou = float(encoder_params.match_iou)
    ignore_iou = float(encoder_params.ignore_iou)
    variance = tuple(float(v) for v in encoder_params.box_variance)
    scale_targets = bool(encoder_params.scale_box_targets)

    def _single(gt_boxes, gt_classes, gt_valid):
        return encode(anchor_const, gt_boxes, gt_classes, gt_valid,
                      match_iou, ignore_iou, variance, scale_targets,
                      use_pallas=use_pallas)

    def _batched(gt_boxes, gt_classes, gt_valid):
        enc = jax.vmap(_single)(gt_boxes, gt_classes, gt_valid)
        return to_pyramid(enc, anchors, use_iou_targets, batched=True)

    return _batched
