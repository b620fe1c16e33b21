"""FCOS losses: sigmoid focal (cls), BCE centerness, IoU/GIoU regression.

Numerical semantics match `/root/reference/model/loss.py` (focal clip window
loss.py:189, per-sample sum / num_pos then batch mean, ltrb-space IoU/GIoU)
but the per-sample Python loops (loss.py:20,43,129) are replaced by masked
vectorized reductions so the whole loss is one fused XLA computation.

Inputs are flattened over levels: ``[B, N, C]`` predictions against the
``[B, N, ...]`` targets from :mod:`..ops.targets`.  The positive mask is
``cnt_target > -1`` (loss.py:209).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.boxes import ltrb_giou, ltrb_iou


def flatten_level_preds(preds: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concat per-level NHWC predictions to ``[B, sum(H*W), C]``."""
    b = preds[0].shape[0]
    c = preds[0].shape[-1]
    return jnp.concatenate([p.reshape(b, -1, c) for p in preds], axis=1)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets_onehot: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (reference loss.py:180-193).

    The reference clips probabilities to ``[5e-6, 1 - 5e-11]`` before the log;
    we reproduce that exactly (it bounds the loss rather than the gradient).
    """
    p = jnp.clip(jax_sigmoid(logits), 5e-6, 1.0 - 5e-11)
    pt = p * targets_onehot + (1.0 - p) * (1.0 - targets_onehot)
    w = alpha * targets_onehot + (1.0 - alpha) * (1.0 - targets_onehot)
    return -w * jnp.power(1.0 - pt, gamma) * jnp.log(pt)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable elementwise binary cross entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def distance_centerness_loss(
    cnt_logits: jnp.ndarray,
    cnt_target: jnp.ndarray,
    reg_preds: jnp.ndarray,
    reg_target: jnp.ndarray,
    mask: jnp.ndarray,
    num_pos: jnp.ndarray,
    distance_weight: float = 0.5,
) -> jnp.ndarray:
    """Experimental distance-aware centerness (reference compute_dcnt_loss,
    loss.py:60-113, commented out of FCOSLoss): BCE on centerness plus an L1
    on the sigmoid of the predicted box diagonal length vs the target's.
    Vectorized; per-sample sum / num_pos.
    """
    bce = jnp.where(mask, bce_with_logits(cnt_logits[..., 0], jnp.where(mask, cnt_target[..., 0], 0.0)), 0.0)

    def diag(reg):
        w = reg[..., 0] + reg[..., 2]
        h = reg[..., 1] + reg[..., 3]
        return jax_sigmoid(jnp.sqrt(jnp.maximum(w * w + h * h, 0.0)))

    safe_t = jnp.where(mask[..., None], reg_target, 1.0)
    l1 = jnp.where(mask, jnp.abs(diag(reg_preds) - diag(safe_t)), 0.0)
    per_sample = jnp.sum(bce + distance_weight * l1, axis=1)
    return jnp.mean(per_sample / num_pos)


def fcos_loss(
    cls_logits: jnp.ndarray,
    cnt_logits: jnp.ndarray,
    reg_preds: jnp.ndarray,
    cls_target: jnp.ndarray,
    cnt_target: jnp.ndarray,
    reg_target: jnp.ndarray,
    mode: str = "giou",
    cnt_mode: str = "bce",
) -> Dict[str, jnp.ndarray]:
    """Total FCOS loss (reference loss.py:196-215).

    cls_logits ``[B,N,C]``, cnt_logits ``[B,N,1]``, reg_preds ``[B,N,4]``
    (already flattened over levels; use :func:`flatten_level_preds`).
    Targets from :func:`..ops.targets.generate_targets`.

    Returns dict with ``cls``, ``cnt``, ``reg``, ``total`` scalar losses, each
    a batch-mean of per-sample (sum / num_pos).
    """
    num_classes = cls_logits.shape[-1]
    mask = cnt_target[..., 0] > -1  # [B, N]
    num_pos = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(jnp.float32)  # [B]

    # --- classification: focal over ALL locations (negatives included) ---
    onehot = (
        jnp.arange(1, num_classes + 1, dtype=cls_target.dtype)[None, None, :]
        == cls_target
    ).astype(jnp.float32)
    cls_per_sample = jnp.sum(sigmoid_focal_loss(cls_logits, onehot), axis=(1, 2))
    cls_loss = jnp.mean(cls_per_sample / num_pos)

    # --- centerness: BCE on positives only (or distance-aware variant) ---
    if cnt_mode == "dcnt":
        cnt_loss = distance_centerness_loss(
            cnt_logits, cnt_target, reg_preds, reg_target, mask, num_pos
        )
    else:
        cnt_t = jnp.where(mask, cnt_target[..., 0], 0.0)
        cnt_elem = bce_with_logits(cnt_logits[..., 0], cnt_t)
        cnt_per_sample = jnp.sum(jnp.where(mask, cnt_elem, 0.0), axis=1)
        cnt_loss = jnp.mean(cnt_per_sample / num_pos)

    # --- regression: IoU/GIoU in ltrb space on positives only ---
    # sanitize masked-out rows so the IoU math stays well-conditioned
    safe_target = jnp.where(mask[..., None], reg_target, 1.0)
    safe_pred = jnp.where(mask[..., None], reg_preds, 1.0)
    if mode == "iou":
        reg_elem = -jnp.log(jnp.maximum(ltrb_iou(safe_pred, safe_target), 1e-6))
    elif mode == "giou":
        reg_elem = 1.0 - ltrb_giou(safe_pred, safe_target)
    else:
        raise NotImplementedError("reg loss only implemented ['iou','giou']")
    reg_per_sample = jnp.sum(jnp.where(mask, reg_elem, 0.0), axis=1)
    reg_loss = jnp.mean(reg_per_sample / num_pos)

    total = cls_loss + cnt_loss + reg_loss
    return {"cls": cls_loss, "cnt": cnt_loss, "reg": reg_loss, "total": total}
