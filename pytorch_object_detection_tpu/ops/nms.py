"""Fixed-shape, fully on-device NMS.

Replaces `torchvision.ops.batched_nms` (used by the reference at
model/modules/head.py:94) with a statically-shaped suppression sweep that
runs under `jit` on TPU: no ragged tensors, no host round trips.  Candidates
arrive already sorted by descending score (the decode step's top-k produces
that order); suppression is the exact greedy NMS recurrence, expressed as a
`lax.fori_loop` over the precomputed IoU matrix.  Class-awareness uses the
standard coordinate-offset trick (one offset per class id, matching
torchvision's batched_nms semantics).

A Pallas kernel variant lives in :mod:`.pallas_nms`; this XLA version is the
reference implementation and CPU/interpret fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.boxes import pairwise_iou


def nms_keep_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes; returns a keep mask.

    boxes: ``[K, 4]`` xyxy, sorted by descending score.
    valid: ``[K]`` bool; invalid boxes are pre-suppressed and cannot suppress
      others (this implements the reference's score-threshold pre-filter,
      head.py:90, without ragged shapes).
    """
    k = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # [K, K]
    idx = jnp.arange(k)

    def body(i, suppressed):
        active = jnp.logical_not(suppressed[i])
        row = iou[i]
        newly = active & (row > iou_threshold) & (idx > i)
        return suppressed | newly

    suppressed = jax.lax.fori_loop(0, k, body, jnp.logical_not(valid))
    return jnp.logical_not(suppressed) & valid


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick (single image).

    boxes ``[K,4]`` sorted by descending score, classes ``[K]`` int,
    valid ``[K]`` bool.  Returns keep mask ``[K]``.
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_keep_mask(shifted, valid, iou_threshold)
