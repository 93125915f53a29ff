"""Pallas TPU kernel: batched greedy (soft-)NMS.

The XLA lowering of greedy NMS (lax.scan of select+suppress,
ops/nms.py) round-trips the candidate buffers through HBM on every one of
the `max_detections` iterations. This kernel keeps each lane's candidates
resident in VMEM for the whole selection loop: grid over lane blocks of 8
(sublane dimension), candidates along the 128-wide lane dimension, the
entire select -> suppress loop running on the VPU with zero HBM traffic
between iterations.

Exact same selection semantics as ops/nms.py:nms_select (greedy by score,
first-index tie-breaking, NonMaxSuppressionV5 soft decay exp(-iou^2/(2s)));
the unit tests cross-check kernel vs XLA reference lane-by-lane.

Layout: boxes are passed as four (L, k) planes (x1, y1, x2, y2) rather than
(L, k, 4) so the candidate axis k sits on the 128-lane dimension.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e10
# Lanes per grid step. Bigger blocks amortize the sequential
# select->suppress loop across more sublanes; 64 lanes x k=1024 keeps the
# five f32 candidate planes + outputs well under the ~16 MB VMEM budget.
_LANE_BLOCK = 64


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                idx_out_ref, score_out_ref,
                *, max_detections: int, iou_threshold: float,
                score_threshold: float, soft_nms_sigma: float, soft: bool):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    k = x1.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)
    out_cols = jax.lax.broadcasted_iota(
        jnp.int32, idx_out_ref.shape, 1)        # (8, md_pad)

    def body(i, carry):
        scores, idx_acc, score_acc = carry
        best = jnp.max(scores, axis=1, keepdims=True)            # (8,1)
        # first-index argmax
        masked_ids = jnp.where(scores == best, col_ids, k)
        bidx = jnp.min(masked_ids, axis=1, keepdims=True)        # (8,1)
        onehot = (col_ids == bidx).astype(jnp.float32)
        ok = best > score_threshold                              # (8,1)

        sx1 = jnp.sum(x1 * onehot, axis=1, keepdims=True)
        sy1 = jnp.sum(y1 * onehot, axis=1, keepdims=True)
        sx2 = jnp.sum(x2 * onehot, axis=1, keepdims=True)
        sy2 = jnp.sum(y2 * onehot, axis=1, keepdims=True)
        sarea = jnp.maximum(sx2 - sx1, 0.0) * jnp.maximum(sy2 - sy1, 0.0)

        ix = jnp.maximum(
            jnp.minimum(x2, sx2) - jnp.maximum(x1, sx1), 0.0)
        iy = jnp.maximum(
            jnp.minimum(y2, sy2) - jnp.maximum(y1, sy1), 0.0)
        inter = ix * iy
        union = jnp.maximum(area + sarea - inter, 1e-8)
        iou = inter / union

        sel_mask = onehot > 0
        if soft:
            if soft_nms_sigma > 0.0:
                scale = jnp.exp(-(iou * iou) / (2.0 * soft_nms_sigma))
                scale = jnp.where(iou > iou_threshold, 0.0, scale)
            else:
                scale = (iou <= iou_threshold).astype(jnp.float32)
            new_scores = scores * scale
        else:
            new_scores = jnp.where(iou > iou_threshold, _NEG_INF, scores)
        new_scores = jnp.where(sel_mask, _NEG_INF, new_scores)
        new_scores = jnp.where(ok, new_scores, scores)

        # accumulate column i via a masked full-array update (Mosaic has no
        # dynamic sub-128 column stores)
        write = out_cols == i
        idx_acc = jnp.where(write & ok, bidx, idx_acc)
        score_acc = jnp.where(write & ok, best, score_acc)
        return new_scores, idx_acc, score_acc

    idx0 = jnp.full(idx_out_ref.shape, -1, jnp.int32)
    sc0 = jnp.full(score_out_ref.shape, -1.0, jnp.float32)
    _, idx_acc, score_acc = jax.lax.fori_loop(
        0, max_detections, body, (scores_ref[:], idx0, sc0))
    idx_out_ref[:] = idx_acc
    score_out_ref[:] = score_acc


@functools.partial(
    jax.jit, static_argnames=("max_detections", "iou_threshold",
                              "score_threshold", "soft_nms_sigma", "soft",
                              "interpret"))
def pallas_nms(boxes: jnp.ndarray,
               scores: jnp.ndarray,
               max_detections: int = 100,
               iou_threshold: float = 0.5,
               score_threshold: float = float(_NEG_INF),
               soft_nms_sigma: float = 0.0,
               soft: bool = False,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over lanes.

    boxes: (L, k, 4) corner boxes; scores: (L, k).
    Returns (indices (L, max_det) int32 [-1 padded -> clamped 0],
             scores (L, max_det), valid (L,)).
    """
    lanes, k = scores.shape
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)

    # pad candidate axis to a lane multiple and lanes to the block size
    k_pad = (-k) % 128
    lane_pad = (-lanes) % _LANE_BLOCK
    if k_pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, k_pad)),
                         constant_values=_NEG_INF)
    if lane_pad:
        boxes = jnp.pad(boxes, ((0, lane_pad), (0, 0), (0, 0)))
        scores = jnp.pad(scores, ((0, lane_pad), (0, 0)),
                         constant_values=_NEG_INF)
    total_lanes, k_total = scores.shape

    planes = [boxes[..., i] for i in range(4)]  # (L, k) each

    kernel = functools.partial(
        _nms_kernel, max_detections=max_detections,
        iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold),
        soft_nms_sigma=float(soft_nms_sigma), soft=bool(soft))

    md_pad = max_detections + ((-max_detections) % 128)
    grid = (total_lanes // _LANE_BLOCK,)
    in_spec = pl.BlockSpec((_LANE_BLOCK, k_total), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_LANE_BLOCK, md_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    idx_out, score_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 5,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((total_lanes, md_pad), jnp.int32),
            jax.ShapeDtypeStruct((total_lanes, md_pad), jnp.float32),
        ),
        interpret=interpret,
    )(*planes, scores)

    idx_out = idx_out[:lanes, :max_detections]
    score_out = score_out[:lanes, :max_detections]
    valid = jnp.sum((idx_out >= 0).astype(jnp.int32), axis=1)
    return jnp.maximum(idx_out, 0), score_out, valid
