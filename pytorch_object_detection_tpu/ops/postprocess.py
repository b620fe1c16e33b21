"""FCOS detection decode: scores, classes, boxes, top-k, NMS — all on device.

Replaces the reference's `FCOSHead` inference module
(`/root/reference/model/modules/head.py:41-102`), whose per-image Python
loops and ragged `torch.stack` were only safe at batch size 1.  Here the
whole pipeline is batched and statically shaped: outputs are always
``[B, max_det]`` with a validity mask, so any batch size jit-compiles once
and runs at full throughput.

Score semantics match the reference exactly (head.py:57-66):
``score = sqrt(sigmoid(cls_max) * sigmoid(cnt))``, class = argmax + 1,
boxes decoded as ``coords -/+ ltrb``.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.boxes import (
    all_level_coords,
    clip_boxes,
    ltrb_to_boxes,
)
from pytorch_object_detection_tpu.ops.losses import flatten_level_preds
from pytorch_object_detection_tpu.ops.nms import batched_class_nms


def resolve_nms_impl(nms_impl: str = "auto") -> str:
    """'auto' -> the Pallas VMEM kernel on TPU (~0.35 ms vs ~2 ms fixpoint
    at B=64/K=1000, exact — reference parity via the C++ oracle in
    tests/test_native.py), XLA fixpoint elsewhere (Pallas TPU kernels only
    execute on TPU, or under interpret mode).  Env ``PODT_NMS`` overrides
    ('pallas' | 'fixpoint')."""
    env = os.environ.get("PODT_NMS")
    if env in ("pallas", "fixpoint"):
        return env
    if nms_impl != "auto":
        return nms_impl
    try:
        backend = jax.default_backend()
    except Exception:  # backend init failure: be conservative
        backend = "cpu"
    return "pallas" if backend == "tpu" else "fixpoint"


class Detections(NamedTuple):
    """Fixed-size batched detections.

    scores ``[B, K]``, classes ``[B, K]`` int32 (1-based), boxes ``[B, K, 4]``
    xyxy, valid ``[B, K]`` bool (True = survived threshold + NMS).  Entries
    are sorted by descending score.
    """

    scores: jnp.ndarray
    classes: jnp.ndarray
    boxes: jnp.ndarray
    valid: jnp.ndarray


def decode_detections(
    cls_levels: Sequence[jnp.ndarray],
    cnt_levels: Sequence[jnp.ndarray],
    reg_levels: Sequence[jnp.ndarray],
    strides: Sequence[int],
    score_threshold: float = 0.05,
    nms_iou: float = 0.6,
    max_detections: int = 1000,
    image_hw: tuple | None = None,
    nms_impl: str = "auto",
) -> Detections:
    """Decode per-level NHWC head outputs into final detections.

    cls_levels[i]: ``[B, H_i, W_i, C]`` logits; cnt ``[..., 1]``; reg ``[..., 4]``.
    If ``image_hw`` is given, boxes are clipped to the image (reference
    ClipBoxes, head.py:152-162).  ``nms_impl``: 'auto' (default — Pallas on
    TPU, fixpoint elsewhere; see :func:`resolve_nms_impl`), 'fixpoint' (XLA
    while-loop, exact, ~2 ms at B=64/K=1000) or 'pallas' (VMEM kernel,
    exact, ~0.35 ms; one extra Mosaic compile).
    """
    nms_impl = resolve_nms_impl(nms_impl)
    level_shapes = [p.shape[1:3] for p in cls_levels]
    coords = all_level_coords(level_shapes, strides)  # [N, 2]

    cls_logits = flatten_level_preds(cls_levels)  # [B, N, C]
    cnt_logits = flatten_level_preds(cnt_levels)  # [B, N, 1]
    reg_preds = flatten_level_preds(reg_levels)  # [B, N, 4]

    # sigmoid is monotone: max/argmax over classes commute with it, so the
    # [B, N, C] sigmoid never materializes — one sigmoid on the [B, N] max
    cls_score = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))  # [B, N]
    cls_class = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32) + 1  # 1-based
    cnt_p = jax.nn.sigmoid(cnt_logits)
    # sqrt is monotone too: top-k runs on the product, sqrt touches only the
    # K survivors instead of all N grid points
    score_sq = cls_score * cnt_p[..., 0]

    k = min(max_detections, score_sq.shape[-1])
    top_sq, top_idx = jax.lax.top_k(score_sq, k)  # sorted descending
    top_scores = jnp.sqrt(top_sq)
    top_classes = jnp.take_along_axis(cls_class, top_idx, axis=1)
    # decode boxes AFTER the top-k gather: ltrb->xyxy runs on [B, K] rows
    # instead of all [B, N] grid points (N/K ~ 5.5x at 512^2)
    top_reg = jnp.take_along_axis(reg_preds, top_idx[..., None], axis=1)
    top_coords = jnp.take(coords, top_idx, axis=0)  # [B, K, 2]
    top_boxes = ltrb_to_boxes(top_coords, top_reg)

    if image_hw is not None:
        top_boxes = clip_boxes(top_boxes, image_hw[0], image_hw[1])

    valid = top_scores >= score_threshold

    if nms_impl == "pallas":
        from pytorch_object_detection_tpu.ops.pallas_nms import pallas_batched_class_nms

        keep = pallas_batched_class_nms(top_boxes, top_scores, top_classes, valid, nms_iou)
        keep = keep & valid
    else:
        keep = batched_class_nms(top_boxes, top_scores, top_classes, valid, nms_iou)
    return Detections(top_scores, top_classes, top_boxes, keep)
