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

    boxes: ``[K, 4]`` xyxy, sorted by descending score (leading batch dims
    allowed: ``[..., K, 4]`` with ``valid [..., K]``).
    valid: bool; invalid boxes are pre-suppressed and cannot suppress others
    (this implements the reference's score-threshold pre-filter, head.py:90,
    without ragged shapes).

    Algorithm: the greedy recurrence ``keep[j] = valid[j] and no kept i<j
    overlaps j`` is evaluated by fixpoint iteration
    ``keep_{n+1}[j] = valid[j] & !any_i(keep_n[i] & i<j & iou[i,j] > t)``.
    The keep prefix stabilizes monotonically (position j only depends on
    positions < j), so this converges to the exact greedy result in at most
    `chain-depth` iterations — typically < 10 — instead of the K sequential
    steps of a scalar loop.  One ``while_loop`` serves the whole batch; each
    iteration is a single [.., K, K] masked reduction that maps onto the VPU.
    """
    k = boxes.shape[-2]
    iou = pairwise_iou(boxes, boxes)  # [..., K, K]
    idx = jnp.arange(k)
    overlaps = (iou > iou_threshold) & (idx[:, None] < idx[None, :])  # i suppresses j

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(keep[..., :, None] & overlaps, axis=-2)
        new_keep = valid & jnp.logical_not(suppressed)
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True), 0))
    return keep


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick.

    boxes ``[..., K, 4]`` sorted by descending score, classes ``[..., K]``
    int, valid ``[..., K]`` bool.  Returns keep mask ``[..., K]``.  Works on
    a whole batch at once (one while_loop for all images).
    """
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[..., None]
    return nms_keep_mask(shifted, valid, iou_threshold)
