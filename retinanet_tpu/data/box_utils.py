"""Box math in JAX. Semantics match reference retinanet/dataloader/utils.py:4-46.

All functions are pure jnp and jit/vmap friendly. Boxes are either
`[x, y, w, h]` (center format) or `[x1, y1, x2, y2]` (corner format).
"""

from __future__ import annotations

import jax.numpy as jnp


def swap_xy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[y, x, y2, x2] <-> [x, y, x2, y2]."""
    return jnp.stack(
        [boxes[..., 1], boxes[..., 0], boxes[..., 3], boxes[..., 2]], axis=-1)


def convert_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners -> center format (reference dataloader/utils.py:10-15)."""
    return jnp.concatenate(
        [(boxes[..., :2] + boxes[..., 2:]) / 2.0,
         boxes[..., 2:] - boxes[..., :2]],
        axis=-1)


def convert_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center format -> corners (reference dataloader/utils.py:18-25)."""
    return jnp.concatenate(
        [boxes[..., :2] - boxes[..., 2:] / 2.0,
         boxes[..., :2] + boxes[..., 2:] / 2.0],
        axis=-1)


def compute_iou(boxes1: jnp.ndarray,
                boxes2: jnp.ndarray,
                pairwise: bool = True) -> jnp.ndarray:
    """IoU of center-format boxes (reference dataloader/utils.py:27-46).

    pairwise=True:  boxes1 (M, 4), boxes2 (N, 4) -> (M, N)
    pairwise=False: elementwise with broadcasting -> (max(M, N),)
    """
    c1 = convert_to_corners(boxes1)
    c2 = convert_to_corners(boxes2)
    if pairwise:
        c1 = c1[..., :, None, :]

    lu = jnp.maximum(c1[..., :2], c2[..., :2])
    rd = jnp.minimum(c1[..., 2:], c2[..., 2:])
    intersection = jnp.maximum(0.0, rd - lu)
    intersection_area = intersection[..., 0] * intersection[..., 1]

    area1 = boxes1[..., 2] * boxes1[..., 3]
    area2 = boxes2[..., 2] * boxes2[..., 3]
    if pairwise:
        area1 = area1[..., :, None]

    union_area = jnp.maximum(area1 + area2 - intersection_area, 1e-8)
    return jnp.clip(intersection_area / union_area, 0.0, 1.0)


def corners_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of corner-format boxes; (M,4),(N,4) -> (M,N).

    Used by NMS where boxes are already corners (normalized [0,1]).
    """
    lu = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rd = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    inter = jnp.maximum(0.0, rd - lu)
    inter_area = inter[..., 0] * inter[..., 1]
    area1 = ((boxes1[..., 2] - boxes1[..., 0])
             * (boxes1[..., 3] - boxes1[..., 1]))[..., :, None]
    area2 = ((boxes2[..., 2] - boxes2[..., 0])
             * (boxes2[..., 3] - boxes2[..., 1]))[..., None, :]
    union = jnp.maximum(area1 + area2 - inter_area, 1e-8)
    return jnp.clip(inter_area / union, 0.0, 1.0)
