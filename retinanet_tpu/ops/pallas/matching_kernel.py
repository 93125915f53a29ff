"""Pallas TPU kernel: anchor<->GT IoU matching for the label encoder.

The XLA lowering of the matcher materializes the (G x A) IoU matrix
(100 x ~77k f32 per image) in HBM and sweeps it three times (max over G,
argmax over G, argmax over A) — ~15 ms of the 640x640 train step. This
kernel streams anchor tiles through VMEM once, computing the (G, tile) IoU
block in registers and folding all three reductions on the fly:

  per anchor: running max IoU over GTs + first-index argmax,
  per GT:     running max IoU over anchors + first-index argmax
              (carried across sequential grid steps in VMEM scratch).

Outputs feed the same force-match scatter + target math as the XLA path
(data/label_encoder.py) — tie-breaking (first index wins) matches
jnp.argmax exactly; tests compare kernel vs XLA per-anchor.

Layout: anchors pre-tiled to (T, LANE) planes (cx, cy, w, h); GTs padded to
G_PAD=128 as (G_PAD, 1) planes. Grid is sequential over anchor tiles, one
image per vmap lane.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0
G_PAD = 128
_SUB = 32     # sublanes per anchor tile
_LANE = 128   # lanes per anchor tile


_G_GROUP = 8  # GTs processed per inner-loop iteration


def _match_kernel(nvalid_ref, gx_ref, gy_ref, gw_ref, gh_ref, gvalid_ref,
                  ax_ref, ay_ref, aw_ref, ah_ref,
                  max_iou_ref, arg_ref, gt_val_ref, gt_idx_ref,
                  gt_best_val, gt_best_idx, *, num_tiles: int):
    t = pl.program_id(0)

    # anchor tile (SUB, LANE)
    ax = ax_ref[:]
    ay = ay_ref[:]
    aw = aw_ref[:]
    ah = ah_ref[:]
    a_area = aw * ah
    ax1 = ax - aw * 0.5
    ay1 = ay - ah * 0.5
    ax2 = ax + aw * 0.5
    ay2 = ay + ah * 0.5

    neg = jnp.full(ax.shape, _NEG, jnp.float32)
    init_arg = jnp.full(ax.shape, G_PAD, jnp.int32)

    # Only sweep GT groups that contain a valid row — images rarely carry
    # more than a dozen objects of the G_PAD=128 padding, so the dynamic
    # trip count cuts the dominant 3D IoU work by ~8-16x vs the padded
    # sweep (the XLA matcher cannot skip padded rows: static shapes).
    n_groups = (nvalid_ref[0] + (_G_GROUP - 1)) // _G_GROUP

    def group(gi, carry):
        best, argbest = carry
        off = pl.multiple_of(gi * _G_GROUP, _G_GROUP)
        gx = gx_ref[pl.ds(off, _G_GROUP), :]
        gy = gy_ref[pl.ds(off, _G_GROUP), :]
        gw = gw_ref[pl.ds(off, _G_GROUP), :]
        gh = gh_ref[pl.ds(off, _G_GROUP), :]
        gvalid = gvalid_ref[pl.ds(off, _G_GROUP), :]
        g_area = gw * gh
        gx1 = gx - gw * 0.5
        gy1 = gy - gh * 0.5
        gx2 = gx + gw * 0.5
        gy2 = gy + gh * 0.5

        # IoU block (G_GROUP, SUB, LANE)
        ix = jnp.maximum(
            0.0, jnp.minimum(gx2[:, :, None], ax2[None]) -
            jnp.maximum(gx1[:, :, None], ax1[None]))
        iy = jnp.maximum(
            0.0, jnp.minimum(gy2[:, :, None], ay2[None]) -
            jnp.maximum(gy1[:, :, None], ay1[None]))
        inter = ix * iy
        union = jnp.maximum(g_area[:, :, None] + a_area[None] - inter, 1e-8)
        iou = jnp.clip(inter / union, 0.0, 1.0)
        # padded/invalid GTs must never match (reference masks rows to -1)
        iou = jnp.where(gvalid[:, :, None] > 0, iou, _NEG)

        # per-anchor best over this group. NOTE: Mosaic aborts on `where`
        # against a keepdims multi-axis reduction ((G,1,1) broadcast), so
        # masks use 2D-reduced values re-expanded with [..., None].
        gbest = jnp.max(iou, axis=0)                         # (SUB, LANE)
        g_ids = (jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0)
                 + off)
        masked_ids = jnp.where(iou >= gbest[None], g_ids, G_PAD)
        garg = jnp.min(masked_ids, axis=0)                   # (SUB, LANE)
        take = gbest > best  # earlier group wins ties (lower gt index)
        best = jnp.where(take, gbest, best)
        argbest = jnp.where(take, garg, argbest)

        # per-GT best over this tile's anchors
        tile_best2 = jnp.max(jnp.max(iou, axis=2), axis=1,
                             keepdims=True)                  # (G_GROUP, 1)
        flat = (jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1) * _LANE
                + jax.lax.broadcasted_iota(jnp.int32, iou.shape, 2)
                + t * (_SUB * _LANE))
        masked_flat = jnp.where(iou >= tile_best2[:, :, None], flat,
                                jnp.int32(2 ** 30))
        tile_arg2 = jnp.min(jnp.min(masked_flat, axis=2), axis=1,
                            keepdims=True)                   # (G_GROUP, 1)

        prev_val = gt_best_val[pl.ds(off, _G_GROUP), :]
        prev_idx = gt_best_idx[pl.ds(off, _G_GROUP), :]
        take_new = tile_best2 > prev_val  # earlier tile wins ties
        gt_best_val[pl.ds(off, _G_GROUP), :] = jnp.where(
            take_new, tile_best2, prev_val)
        gt_best_idx[pl.ds(off, _G_GROUP), :] = jnp.where(
            take_new, tile_arg2.astype(jnp.int32), prev_idx)
        return best, argbest

    # initialize the cross-tile per-GT scratch once (IoU >= 0 always beats
    # the -inf-ish init for valid rows; untouched rows stay masked)
    @pl.when(t == 0)
    def _():
        gt_best_val[:] = jnp.full((G_PAD, 1), -2.0, jnp.float32)
        gt_best_idx[:] = jnp.zeros((G_PAD, 1), jnp.int32)

    best, arg = jax.lax.fori_loop(0, n_groups, group, (neg, init_arg))
    max_iou_ref[:] = best
    arg_ref[:] = arg.astype(jnp.int32)

    @pl.when(t == num_tiles - 1)
    def _():
        gt_val_ref[:] = gt_best_val[:]
        gt_idx_ref[:] = gt_best_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_match(anchors: jnp.ndarray,
                 gt_boxes: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """Single-image matcher.

    anchors: (A, 4) center-format; gt_boxes: (G, 4); gt_valid: (G,) bool.
    Returns (max_iou (A,), argmax_gt (A,) int32,
             gt_best_iou (G,), gt_best_anchor (G,) int32).
    vmap over the batch for batched matching.
    """
    num_anchors, _ = anchors.shape
    num_gt = gt_boxes.shape[0]
    if num_gt > G_PAD:
        raise ValueError(f"max {G_PAD} GTs supported, got {num_gt}")

    tile = _SUB * _LANE
    a_pad = (-num_anchors) % tile
    total = num_anchors + a_pad
    num_tiles = total // tile

    a = jnp.pad(anchors.astype(jnp.float32), ((0, a_pad), (0, 0)))
    a_planes = [a[:, i].reshape(num_tiles * _SUB, _LANE) for i in range(4)]

    g = jnp.pad(gt_boxes.astype(jnp.float32), ((0, G_PAD - num_gt), (0, 0)))
    gv = jnp.pad(gt_valid.astype(jnp.float32), (0, G_PAD - num_gt))
    g_planes = [g[:, i].reshape(G_PAD, 1) for i in range(4)]
    gv = gv.reshape(G_PAD, 1)
    # number of valid GTs drives the dynamic group loop; valid rows are a
    # prefix (the host pipeline packs them first)
    nvalid = jnp.sum(gt_valid.astype(jnp.int32)).reshape(1)

    kernel = functools.partial(_match_kernel, num_tiles=num_tiles)
    gt_spec = pl.BlockSpec((G_PAD, 1), lambda t, nv: (0, 0),
                           memory_space=pltpu.VMEM)
    anchor_spec = pl.BlockSpec((_SUB, _LANE), lambda t, nv: (t, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # nvalid
        grid=(num_tiles,),
        in_specs=[gt_spec] * 5 + [anchor_spec] * 4,
        out_specs=(
            anchor_spec,
            anchor_spec,
            pl.BlockSpec((G_PAD, 1), lambda t, nv: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_PAD, 1), lambda t, nv: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((G_PAD, 1), jnp.float32),
            pltpu.VMEM((G_PAD, 1), jnp.int32),
        ],
    )

    max_iou, arg, gt_val, gt_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * _SUB, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((G_PAD, 1), jnp.float32),
            jax.ShapeDtypeStruct((G_PAD, 1), jnp.int32),
        ),
        interpret=interpret,
    )(nvalid, *g_planes, gv, *a_planes)

    max_iou = max_iou.reshape(-1)[:num_anchors]
    # anchors that saw no valid GT keep the G_PAD sentinel; clamp to match
    # jnp.argmax semantics (callers mask via max_iou <= thresholds anyway)
    arg = jnp.minimum(arg.reshape(-1)[:num_anchors], num_gt - 1)
    return (max_iou, arg, gt_val[:num_gt, 0],
            gt_idx[:num_gt, 0])
