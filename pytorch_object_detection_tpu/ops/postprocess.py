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
    if os.environ.get("PODT_DECODE", "sort") == "sort":
        # carry class/reg THROUGH the top-k sort instead of gathering by
        # index afterwards: XLA's take_along_axis gathers cost 2.1 ms at
        # B=128/K=1000 while top_k already lowers to a 2-operand sort
        # costing 0.3 ms — extra sort operands are far cheaper than
        # gathers (PERF.md r3).  is_stable matches top_k's smallest-
        # index-first tie rule; -score is an exact sign flip (score >= 0).
        bsz, n = score_sq.shape
        idx = jax.lax.broadcasted_iota(jnp.int32, (bsz, n), 1)
        srt = jax.lax.sort(
            (-score_sq, cls_class, reg_preds[..., 0], reg_preds[..., 1],
             reg_preds[..., 2], reg_preds[..., 3], idx),
            dimension=1, is_stable=True, num_keys=1)
        top_sq = -srt[0][:, :k]
        top_classes = srt[1][:, :k]
        rl, rt, rr, rb = (s[:, :k] for s in srt[2:6])
        top_idx = srt[6][:, :k]
        top_scores = jnp.sqrt(top_sq)
        # recompute grid-center coords from the flat index (exact integer
        # arithmetic, f32-representable) instead of gathering the table
        cx = jnp.zeros_like(top_scores)
        cy = jnp.zeros_like(top_scores)
        start = 0
        for (h, w), s in zip(level_shapes, strides):
            j = top_idx - start
            in_l = (top_idx >= start) & (j < h * w)
            lx = (j % w).astype(jnp.float32) * s + s // 2
            ly = (j // w).astype(jnp.float32) * s + s // 2
            cx = jnp.where(in_l, lx, cx)
            cy = jnp.where(in_l, ly, cy)
            start += h * w
        top_boxes = jnp.stack([cx - rl, cy - rt, cx + rr, cy + rb], axis=-1)
    else:
        top_sq, top_idx = jax.lax.top_k(score_sq, k)  # sorted descending
        top_scores = jnp.sqrt(top_sq)
        top_classes = jnp.take_along_axis(cls_class, top_idx, axis=1)
        # decode boxes AFTER the top-k gather: ltrb->xyxy runs on [B, K]
        # rows instead of all [B, N] grid points (N/K ~ 5.5x at 512^2)
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
