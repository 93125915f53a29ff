"""Inference post-processing: fuse -> decode -> top-k -> NMS.

Capability parity with reference
retinanet/model/layers/postprocessing_ops.py:

  * fuse_predictions  == FuseDetections (ref:7-56)
  * decode_detections == TransformBoxesAndScores (ref:59-117): sigmoid
    scores; box decode xy = t_xy * a_wh + a_xy, wh = exp(t_wh) * a_wh ->
    corners, normalized by input_shape; fp32 throughout (ref:111-112).
  * filter_top_k      == FilterTopKDetections (ref:120-173), per-class or
    global pre-NMS top-k.
  * generate_detections == GenerateDetections (ref:177-561) with modes
    CombinedNMS / GlobalSoftNMS / GlobalHardNMS / PerClassSoftNMS /
    PerClassHardNMS — all TPU-safe here (the reference could only run the
    two hard modes on TPU, ref:199-208).

Output dict matches the reference serving signature: scores (B, max_det),
boxes (B, max_det, 4) normalized corners, classes (B, max_det) int32,
valid_detections (B,) int32; empty slots are -1 (ref:316-379).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from retinanet_tpu.data.anchors import AnchorGenerator
from retinanet_tpu.ops import nms as nms_lib

NMS_MODES = ("CombinedNMS", "GlobalSoftNMS", "GlobalHardNMS",
             "PerClassSoftNMS", "PerClassHardNMS")


def _orderable_u16(x_bf16: jnp.ndarray) -> jnp.ndarray:
    """Monotone bf16 -> u16 bit mapping (finite inputs): integer order
    equals float order. Positive: set the sign bit; negative: invert."""
    bits = jax.lax.bitcast_convert_type(x_bf16, jnp.uint16)
    return jnp.where((bits >> 15) == 0,
                     bits | jnp.uint16(0x8000),
                     jnp.bitwise_not(bits))


def _unorderable_u16(ubits: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _orderable_u16."""
    bits = jnp.where((ubits & jnp.uint16(0x8000)) != 0,
                     ubits & jnp.uint16(0x7FFF),
                     jnp.bitwise_not(ubits))
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)


def approx_max_k_packed(scores: jnp.ndarray, k: int,
                        recall_target: float = 0.95):
    """approx_max_k for bf16 with a single-key packed winner sort.

    jax.lax.approx_max_k(aggregate_to_topk=True) finishes with an XLA
    variadic (value, s32 index) pair sort over the (…, L≈9600) bin
    winners — every operand rides the whole sorting network, and the
    index operand later needs a relayout + remap gather (1.7 ms/step in
    the serving profile). Instead, pack ONE u32 sort key per winner:

        key = orderable(value) << idx_bits  |  (mask - global_index)

    value-major so order follows the score; index inverted in the low
    bits so ties prefer the lower index (lax.top_k semantics). After the
    sort BOTH the index and the value unpack elementwise — no gather.
    Measured vs aggregate_to_topk=True on (8, 80, 76725)->256: the pair
    sort alone was 5.5 ms; this path's sort is 2.1 ms and the unpack is
    fused (tools/topk_experiments.py).

    Precision: the value keeps min(16, 32 - ceil(log2(A))) of the bf16's
    16 bits — full precision up to A=65536 anchors; at COCO-640 scale
    (A=76725, 17 index bits) the bf16 mantissa LSB is dropped, a
    <=2^-8 relative logit quantization confined to this approx lane.
    Falls back to plain approx_max_k for non-bf16 inputs or A > 2^17.
    """
    a = scores.shape[-1]
    idx_bits = max(int(a - 1).bit_length(), 1)
    if scores.dtype != jnp.bfloat16 or idx_bits > 17:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    vals, idx = jax.lax.approx_max_k(
        scores, k, recall_target=recall_target, aggregate_to_topk=False)
    length = vals.shape[-1]
    if length < k:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    drop = 16 - min(16, 32 - idx_bits)
    mask = jnp.uint32((1 << idx_bits) - 1)
    axis = vals.ndim - 1
    key = (((_orderable_u16(vals).astype(jnp.uint32) >> drop) << idx_bits)
           | (mask - idx.astype(jnp.uint32)))
    skey = jax.lax.sort(key, dimension=axis, is_stable=False)
    top = jax.lax.rev(skey[..., length - k:], (axis,))
    top_idx = (mask - (top & mask)).astype(jnp.int32)
    top_vals = _unorderable_u16(
        ((top >> idx_bits) << drop).astype(jnp.uint16))
    return top_vals, top_idx


def fuse_predictions(predictions: Dict, min_level: int,
                     max_level: int,
                     logits_dtype=None) -> Dict[str, jnp.ndarray]:
    """Per-level (B,H,W,A*C) maps -> flat (B, total_anchors, C).

    `logits_dtype` (e.g. bf16) casts each level's class map BEFORE the
    reshape/concat so the convert fuses into the head conv's epilogue and
    every downstream marshalling copy moves half the bytes. Used by the
    approx-top-k serving lane; exact/parity paths keep the head's f32.
    """
    cls_preds = predictions["class-predictions"]
    box_preds = predictions["box-predictions"]
    first = str(min_level)
    anchors_per_loc = box_preds[first].shape[-1] // 4
    num_classes = cls_preds[first].shape[-1] // anchors_per_loc
    batch = box_preds[first].shape[0]

    logits, boxes = [], []
    for level in range(min_level, max_level + 1):
        key = str(level)
        b, h, w, _ = box_preds[key].shape
        n = h * w * anchors_per_loc
        cls_map = cls_preds[key]
        if logits_dtype is not None:
            cls_map = cls_map.astype(logits_dtype)
        logits.append(cls_map.reshape(batch, n, num_classes))
        boxes.append(box_preds[key].reshape(batch, n, 4))
    return {
        "class_logits": jnp.concatenate(logits, axis=1),
        "encoded_boxes": jnp.concatenate(boxes, axis=1),
    }


def decode_box_regressions(encoded: jnp.ndarray,
                           anchor_boxes: jnp.ndarray,
                           input_shape,
                           box_variance=(0.1, 0.1, 0.2, 0.2),
                           scale_box_predictions: bool = False
                           ) -> jnp.ndarray:
    """(…, 4) encoded regressions + matching (…, 4) cxcywh anchors ->
    normalized corner boxes. Shared by the decode-everything path and the
    decode-after-top-k lane, so the two are the same elementwise program
    (bitwise-equal boxes either way)."""
    encoded = encoded.astype(jnp.float32)
    a_xy, a_wh = anchor_boxes[..., :2], anchor_boxes[..., 2:]
    if scale_box_predictions:
        encoded = encoded * jnp.asarray(box_variance, jnp.float32)
    xy = encoded[..., :2] * a_wh + a_xy
    wh = jnp.exp(encoded[..., 2:]) * a_wh
    half = wh / 2.0
    corners = jnp.concatenate([xy - half, xy + half], axis=-1)
    h, w = float(input_shape[0]), float(input_shape[1])
    return corners / jnp.asarray([w, h, w, h], jnp.float32)


def decode_detections(fused: Dict[str, jnp.ndarray],
                      anchors: AnchorGenerator,
                      input_shape,
                      box_variance=(0.1, 0.1, 0.2, 0.2),
                      scale_box_predictions: bool = False,
                      ) -> Dict[str, jnp.ndarray]:
    logits = fused["class_logits"].astype(jnp.float32)
    corners = decode_box_regressions(
        fused["encoded_boxes"], jnp.asarray(anchors.boxes)[None],
        input_shape, box_variance, scale_box_predictions)
    return {"scores": jax.nn.sigmoid(logits), "boxes": corners}


def filter_top_k(detections: Dict[str, jnp.ndarray],
                 top_k: int,
                 filter_per_class: bool = True,
                 approx: bool = False,
                 recall_target: float = 0.95,
                 anchor_boxes: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
    """Pre-NMS top-k. `approx=True` uses jax.lax.approx_max_k — the
    TPU-optimized partial selection (expected top-k recall >=
    `recall_target`); the exact variant matches the reference's tf.nn.top_k
    (ref:120-173).

    ``anchor_boxes`` (A, 4): also gather each selected candidate's anchor
    row (same indices) and return it under "anchors" — the
    decode-after-top-k serving lane decodes box regressions only for the
    selected candidates instead of all A anchors (identical math per
    element, so bitwise-equal detections; see make_inference_fn).
    """
    import functools
    scores = detections["scores"]       # (B, A, C)
    boxes = detections["boxes"]         # (B, A, 4)
    b, num_anchors, num_classes = scores.shape
    top_fn = (functools.partial(approx_max_k_packed,
                                recall_target=recall_target)
              if approx else jax.lax.top_k)

    if filter_per_class:
        k = min(top_k, num_anchors)
        # Measured variants at 640x640/bs8 (full pipeline): this layout with
        # f32 approx_max_k = 51 ms; reduction_dimension=1 (no transpose) =
        # 68 ms (XLA transposes internally anyway); bf16 selection + exact
        # re-gather = 65 ms (cast+gather cost more than the bandwidth
        # saved). Keeping the simple form.
        # NEGATIVE RESULT (round 2): a two-stage approx_max_k (stage 1
        # aggregate_to_topk=False to skip the (B,C,~9600) winner sort
        # [3.8 ms in the profile], stage 2 approx over the winners +
        # take_along_axis index remap) measured 29.3 ms vs 27.2 ms bs8 —
        # the remap gather costs more than the sort it saves. Detections
        # were verified identical to exact top-k on a trained model, but
        # the speed regressed; keeping single-stage.
        # POSITIVE RESULT (round 2, later): for bf16 scores the variadic
        # (value, index) winner sort is replaced by a single-key packed
        # u32 sort with the global index in the low bits
        # (approx_max_k_packed above) — the index unpacks elementwise,
        # killing both the pair sort (5.5 -> 2.1 ms) and the 1.7 ms
        # remap gather. Combined with the bf16 serving lane:
        # 27.0 -> 23.5 ms bs8 (296 -> 340 FPS).
        scores_t = jnp.swapaxes(scores, 1, 2)            # (B, C, A)
        top_scores, idx = top_fn(scores_t, k)            # (B, C, k)
        # gather through a flattened index so XLA never materializes the
        # (B, C, A, 4) broadcast of the class-agnostic boxes (~0.8 GB at
        # COCO scale)
        flat_idx = idx.reshape(b, num_classes * k)
        # NEGATIVE RESULT (round 2): replacing this row gather with a
        # one-hot MXU contraction (einsum "bka,bac->bkc" of the inline
        # (B,C*k,A) compare against the boxes, precision=float32) beat
        # the gather in isolation (1.46 vs 2.68 ms) but regressed the
        # full serving program 23.5 -> 42.0 ms bs8 — inside the big
        # program XLA materializes the one-hot operand instead of fusing
        # it into the dot. Keeping the gather.
        top_boxes = jnp.take_along_axis(
            boxes, flat_idx[..., None], axis=1).reshape(
                b, num_classes, k, 4)
        out = {
            "scores": jnp.swapaxes(top_scores, 1, 2),    # (B, k, C)
            "boxes": jnp.swapaxes(top_boxes, 1, 2),      # (B, k, C, 4)
        }
        if anchor_boxes is not None:
            top_anchors = jnp.take(
                anchor_boxes, flat_idx, axis=0).reshape(
                    b, num_classes, k, 4)
            out["anchors"] = jnp.swapaxes(top_anchors, 1, 2)  # (B, k, C, 4)
        return out
    k = min(top_k, num_anchors * num_classes)
    flat = scores.reshape(b, num_anchors * num_classes)
    _, idx = top_fn(flat, k)
    anchor_idx = idx // num_classes                       # (B, k)
    out = {
        "scores": jnp.take_along_axis(
            scores, anchor_idx[..., None], axis=1),      # (B, k, C)
        "boxes": jnp.take_along_axis(
            boxes, anchor_idx[..., None], axis=1),       # (B, k, 4)
    }
    if anchor_boxes is not None:
        out["anchors"] = jnp.take(anchor_boxes, anchor_idx, axis=0)
    return out


def _finalize(boxes, scores, classes, valid, max_detections):
    """Mask empty / sub-threshold slots to -1 (reference ref:316-379)."""
    mask = scores > -0.5
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = mask & (slot < valid[:, None])
    boxes = jnp.where(mask[..., None], boxes, -1.0)
    classes = jnp.where(mask, classes, -1)
    scores = jnp.where(mask, scores, -1.0)
    return {
        "scores": scores,
        "boxes": boxes,
        "classes": classes.astype(jnp.int32),
        "valid_detections": valid.astype(jnp.int32),
    }


def _lane_nms(boxes_l, scores_l, *, max_detections, iou_threshold,
              score_threshold, soft_nms_sigma, soft, use_pallas):
    """NMS over (L, k, 4)/(L, k) lanes -> (idx, scores, valid)."""
    if use_pallas:
        from retinanet_tpu.ops.pallas.nms_kernel import pallas_nms
        return pallas_nms(
            boxes_l, scores_l, max_detections,
            iou_threshold=iou_threshold, score_threshold=score_threshold,
            soft_nms_sigma=soft_nms_sigma, soft=soft)

    def one(bx, sc):
        res = nms_lib.nms_select(
            bx, sc, max_detections, iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            soft_nms_sigma=soft_nms_sigma, soft=soft)
        return res.indices, res.scores, res.valid

    return jax.vmap(one)(boxes_l, scores_l)


def _per_class_nms(scores, boxes, *, num_classes, max_detections,
                   iou_threshold, score_threshold, soft_nms_sigma, soft,
                   use_pallas=False):
    """scores (B, k, C); boxes (B, k, C, 4) or (B, k, 4) class-agnostic."""
    b, k = scores.shape[0], scores.shape[1]
    scores_c = jnp.swapaxes(scores, 1, 2)                 # (B, C, k)
    if boxes.ndim == 4:
        boxes_c = jnp.swapaxes(boxes, 1, 2)               # (B, C, k, 4)
    else:
        boxes_c = jnp.broadcast_to(
            boxes[:, None], (b, num_classes) + boxes.shape[1:])

    # NonMaxSuppressionV5 semantics: soft mode uses iou_threshold=1.0
    idx, sel_scores, _ = _lane_nms(
        boxes_c.reshape(b * num_classes, k, 4),
        scores_c.reshape(b * num_classes, k),
        max_detections=max_detections,
        iou_threshold=1.0 if (soft and soft_nms_sigma > 0.0)
        else iou_threshold,
        score_threshold=score_threshold,
        soft_nms_sigma=soft_nms_sigma, soft=soft, use_pallas=use_pallas)
    sel_boxes = jnp.take_along_axis(
        boxes_c.reshape(b * num_classes, k, 4), idx[..., None], axis=1)
    sel_boxes = sel_boxes.reshape(b, num_classes, max_detections, 4)
    sel_scores = jnp.where(sel_scores > -0.5, sel_scores, -1.0)
    sel_scores = sel_scores.reshape(b, num_classes, max_detections)
    # (B, C, max_det, 4) / (B, C, max_det)
    classes = jax.lax.broadcasted_iota(
        jnp.int32, sel_scores.shape, 1)

    flat_scores = sel_scores.reshape(b, -1)
    flat_boxes = sel_boxes.reshape(b, -1, 4)
    flat_classes = classes.reshape(b, -1)
    top_scores, idx = jax.lax.top_k(flat_scores, max_detections)
    top_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
    top_classes = jnp.take_along_axis(flat_classes, idx, axis=1)
    valid = jnp.sum((top_scores > score_threshold).astype(jnp.int32), axis=1)
    # reference masks by score_threshold post top-k (ref:355-371)
    keep = top_scores > score_threshold
    top_scores = jnp.where(keep, top_scores, -1.0)
    return _finalize(top_boxes, top_scores, top_classes, valid,
                     max_detections)


def _global_nms(scores, boxes, *, max_detections, iou_threshold,
                score_threshold, soft_nms_sigma, soft, use_pallas=False):
    """scores (B, k, C); boxes (B, k, 4)."""
    max_scores = jnp.max(scores, axis=-1)
    classes = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    idx, sel_scores, valid = _lane_nms(
        boxes, max_scores, max_detections=max_detections,
        iou_threshold=1.0 if (soft and soft_nms_sigma > 0.0)
        else iou_threshold,
        score_threshold=score_threshold,
        soft_nms_sigma=soft_nms_sigma, soft=soft, use_pallas=use_pallas)
    sel_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    sel_classes = jnp.take_along_axis(classes, idx, axis=1)
    return _finalize(sel_boxes, sel_scores, sel_classes, valid,
                     max_detections)


def _default_use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def generate_detections(detections: Dict[str, jnp.ndarray],
                        mode: str,
                        num_classes: int,
                        max_detections: int = 100,
                        iou_threshold: float = 0.5,
                        score_threshold: float = 0.05,
                        soft_nms_sigma: float = 0.5,
                        use_pallas: Optional[bool] = None
                        ) -> Dict[str, jnp.ndarray]:
    if mode not in NMS_MODES:
        raise ValueError(f"mode must be one of {NMS_MODES}, got {mode}")
    if use_pallas is None:
        use_pallas = _default_use_pallas()
    scores = detections["scores"].astype(jnp.float32)
    boxes = jnp.clip(detections["boxes"].astype(jnp.float32), 0.0, 1.0)

    common = dict(max_detections=max_detections,
                  iou_threshold=iou_threshold,
                  score_threshold=score_threshold,
                  use_pallas=use_pallas)
    if mode == "CombinedNMS":
        return _per_class_nms(scores, boxes, num_classes=num_classes,
                              soft_nms_sigma=0.0, soft=False, **common)
    if mode == "PerClassHardNMS":
        return _per_class_nms(scores, boxes, num_classes=num_classes,
                              soft_nms_sigma=0.0, soft=False, **common)
    if mode == "PerClassSoftNMS":
        return _per_class_nms(scores, boxes, num_classes=num_classes,
                              soft_nms_sigma=soft_nms_sigma / 2.0, soft=True,
                              **common)
    if mode == "GlobalHardNMS":
        return _global_nms(scores, boxes, soft_nms_sigma=0.0, soft=False,
                           **common)
    return _global_nms(scores, boxes, soft_nms_sigma=soft_nms_sigma / 2.0,
                       soft=True, **common)


def make_inference_fn(model, params, anchors: AnchorGenerator,
                      normalizer, compute_dtype=jnp.bfloat16,
                      skip_decoding: bool = False, skip_nms: bool = False):
    """End-to-end serving function: raw images -> final detections.

    Mirrors ModelBuilder.add_post_processing_stage (reference
    model/builder.py:153-190) incl. the export-mode skips.
    """
    inf = params.inference
    ff = params.architecture.feature_fusion
    min_level, max_level = int(ff.min_level), int(ff.max_level)
    num_classes = int(params.architecture.head.num_classes)

    # NMS candidate cap: greedy NMS only ever selects boxes with score >
    # score_threshold, and a box can only be suppressed by a higher-scoring
    # one, so feeding the top `nms_top_k` candidates (instead of the
    # reference's full pre_nms_top_k=5000) yields identical detections
    # whenever fewer than nms_top_k candidates per class/image clear the
    # threshold — which holds for any sane detector at threshold 0.05.
    # Override with inference.nms_top_k for exact-parity runs.
    # k=256/class: identical detections whenever <256 candidates per
    # class/image clear score_threshold (greedy NMS can only select
    # above-threshold boxes, suppression only flows downward in score);
    # measured 291 FPS vs 158 at k=1000 on bs=8.
    nms_k = min(int(inf.get("nms_top_k", 256)), int(inf.pre_nms_top_k))
    recall_target = float(inf.get("approx_recall_target", 0.95))
    # approx_max_k is the TPU-native partial top-k (bucketed partial
    # reduction, Chern et al. 2022); candidate recall is >=0.95 of the
    # exact set and every recalled candidate keeps its exact score, so
    # detection differences are confined to far-below-threshold tails.
    # Flip off for bitwise parity runs via inference.use_approx_top_k.
    approx_topk = bool(inf.get("use_approx_top_k", True))
    # decode box regressions AFTER the top-k instead of over all A anchors:
    # selection runs on logits either way, and the per-element decode math
    # is shared (decode_box_regressions), so detections are bitwise
    # identical — only the amount of decode work changes (C*k candidates
    # vs A anchors) at the price of one extra (A, 4) anchor-row gather.
    decode_after = bool(inf.get("decode_after_topk", False))

    def infer(model_params, batch_stats, images):
        images = normalizer(images).astype(compute_dtype)
        preds = model.apply(
            {"params": model_params, "batch_stats": batch_stats},
            images, train=False)
        # Approx lane: select on bf16 logits. The fused (B,~77k,C) tensor,
        # its (B,C,A) transpose and the approx_max_k bin reduce + winner
        # sort all move half the bytes; sigmoid runs in f32 on the k
        # winners only. Selection can differ from exact f32 only among
        # logits within one bf16 ulp of each other — the same
        # far-below-visible tie class the approx algorithm itself
        # reorders. Exact/parity runs (use_approx_top_k=false) keep f32
        # end to end.
        # The bf16 cast only applies on the full serving lane where the
        # approx selection actually runs; export lanes (skip_decoding /
        # skip_nms) keep the head's f32 end to end.
        approx_lane = approx_topk and not skip_decoding and not skip_nms
        fused = fuse_predictions(
            preds, min_level, max_level,
            logits_dtype=jnp.bfloat16 if approx_lane else None)
        if skip_decoding:
            return fused
        if skip_nms:
            decoded = decode_detections(
                fused, anchors, params.input.input_shape,
                tuple(params.encoder_params.box_variance),
                bool(params.encoder_params.scale_box_targets))
            return filter_top_k(
                decoded, int(inf.pre_nms_top_k), bool(inf.filter_per_class))
        # top-k on LOGITS (sigmoid is monotonic -> identical selection),
        # sigmoid applied only to the k survivors: avoids a transcendental
        # over the full (B, ~77k, C) score tensor.
        if decode_after:
            filtered = filter_top_k(
                {"scores": fused["class_logits"],
                 "boxes": fused["encoded_boxes"]},
                nms_k, bool(inf.filter_per_class), approx=approx_topk,
                recall_target=recall_target,
                anchor_boxes=jnp.asarray(anchors.boxes))
            filtered["boxes"] = decode_box_regressions(
                filtered["boxes"], filtered.pop("anchors"),
                params.input.input_shape,
                tuple(params.encoder_params.box_variance),
                bool(params.encoder_params.scale_box_targets))
        else:
            decoded = decode_detections(
                fused, anchors, params.input.input_shape,
                tuple(params.encoder_params.box_variance),
                bool(params.encoder_params.scale_box_targets))
            filtered = filter_top_k(
                {"scores": fused["class_logits"],
                 "boxes": decoded["boxes"]},
                nms_k, bool(inf.filter_per_class), approx=approx_topk,
                recall_target=recall_target)
        filtered["scores"] = jax.nn.sigmoid(
            filtered["scores"].astype(jnp.float32))
        return generate_detections(
            filtered, mode=inf.mode, num_classes=num_classes,
            max_detections=int(inf.max_detections),
            iou_threshold=float(inf.iou_threshold),
            score_threshold=float(inf.score_threshold),
            soft_nms_sigma=float(inf.soft_nms_sigma))

    return infer
