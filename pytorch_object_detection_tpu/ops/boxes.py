"""Box and coordinate math for FCOS-style dense detection.

Semantics match the reference implementation
(`/root/reference/utill/utills.py:58-73` grid coords,
`/root/reference/model/modules/head.py:29-38` ltrb decode,
`/root/reference/model/modules/head.py:152-162` box clipping,
`/root/reference/test.py:23-53` pairwise IoU) but are written as pure,
batched, statically-shaped JAX functions so everything stays on device and
jit-compiles once.

Conventions:
  * boxes are ``(x1, y1, x2, y2)`` in image pixels, float32
  * grid coords are ``(x, y)`` centers of feature-map cells
  * per-level feature maps are NHWC
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def level_coords(h: int, w: int, stride: int, dtype=jnp.float32) -> jnp.ndarray:
    """Grid-cell centers for one FPN level, shape ``[h*w, 2]`` as (x, y).

    Matches `coords_origin_fcos` (reference utill/utills.py:58-73):
    ``x = arange(w)*stride + stride//2`` (integer-div offset), row-major
    flatten (y outer, x inner).
    """
    xs = jnp.arange(w, dtype=dtype) * stride + stride // 2
    ys = jnp.arange(h, dtype=dtype) * stride + stride // 2
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def all_level_coords(
    level_shapes: Sequence[Tuple[int, int]], strides: Sequence[int], dtype=jnp.float32
) -> jnp.ndarray:
    """Concatenated grid coords over all levels, shape ``[sum(h*w), 2]``."""
    return jnp.concatenate(
        [level_coords(h, w, s, dtype) for (h, w), s in zip(level_shapes, strides)], axis=0
    )


def ltrb_to_boxes(coords: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Decode ltrb offsets at grid coords to xyxy boxes.

    coords: ``[N, 2]``; offsets: ``[..., N, 4]`` (l, t, r, b) -> ``[..., N, 4]``.
    Matches `_coords2boxes` (reference head.py:29-38).
    """
    x1y1 = coords - offsets[..., :2]
    x2y2 = coords + offsets[..., 2:]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def boxes_to_ltrb(coords: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`ltrb_to_boxes`: xyxy boxes to ltrb offsets at coords."""
    lt = coords - boxes[..., :2]
    rb = boxes[..., 2:] - coords
    return jnp.concatenate([lt, rb], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clamp xyxy boxes into ``[0, w-1] x [0, h-1]`` (reference head.py:152-162)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - 1)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes (no +1; matches reference test.py:47-48)."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix of xyxy boxes: ``[N, 4] x [M, 4] -> [N, M]``.

    Matches the eval-side `iou_2d` (reference test.py:23-53): overlap of raw
    coordinates, no +1 pixel convention.
    """
    lt = jnp.maximum(boxes_a[..., :, None, :2], boxes_b[..., None, :, :2])
    rb = jnp.minimum(boxes_a[..., :, None, 2:], boxes_b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    overlap = wh[..., 0] * wh[..., 1]
    area_a = (boxes_a[..., 2] - boxes_a[..., 0]) * (boxes_a[..., 3] - boxes_a[..., 1])
    area_b = (boxes_b[..., 2] - boxes_b[..., 0]) * (boxes_b[..., 3] - boxes_b[..., 1])
    union = area_a[..., :, None] + area_b[..., None, :] - overlap
    return overlap / jnp.where(union > 0, union, 1.0)


def ltrb_iou(preds: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """IoU computed in ltrb-offset space, elementwise over the last axis.

    Both inputs are ``[..., 4]`` (l, t, r, b) offsets measured from the same
    grid point.  Matches the loss-side overlap math (reference
    model/loss.py:142-152): ``overlap_wh = min(l) + min(r)  (etc.)``.
    """
    lt = jnp.minimum(preds[..., :2], targets[..., :2])
    rb = jnp.minimum(preds[..., 2:], targets[..., 2:])
    wh = jnp.maximum(lt + rb, 0.0)
    overlap = wh[..., 0] * wh[..., 1]
    area_p = (preds[..., 0] + preds[..., 2]) * (preds[..., 1] + preds[..., 3])
    area_t = (targets[..., 0] + targets[..., 2]) * (targets[..., 1] + targets[..., 3])
    union = area_p + area_t - overlap
    return overlap / jnp.where(union != 0, union, eps)


def ltrb_giou(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """GIoU in ltrb-offset space, elementwise (reference model/loss.py:155-177)."""
    lt_min = jnp.minimum(preds[..., :2], targets[..., :2])
    rb_min = jnp.minimum(preds[..., 2:], targets[..., 2:])
    wh_min = jnp.maximum(lt_min + rb_min, 0.0)
    overlap = wh_min[..., 0] * wh_min[..., 1]
    area_p = (preds[..., 0] + preds[..., 2]) * (preds[..., 1] + preds[..., 3])
    area_t = (targets[..., 0] + targets[..., 2]) * (targets[..., 1] + targets[..., 3])
    union = area_p + area_t - overlap
    iou = overlap / jnp.where(union != 0, union, 1e-10)

    lt_max = jnp.maximum(preds[..., :2], targets[..., :2])
    rb_max = jnp.maximum(preds[..., 2:], targets[..., 2:])
    wh_max = jnp.maximum(lt_max + rb_max, 0.0)
    g_area = wh_max[..., 0] * wh_max[..., 1]
    return iou - (g_area - union) / jnp.maximum(g_area, 1e-10)
