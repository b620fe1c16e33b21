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

    The reference clips probabilities to ``[5e-6, 1 - 5e-11]`` before the
    log.  We apply the SAME window, but in log space: in f32 the upper
    bound ``1 - 5e-11`` is unrepresentable (rounds to exactly 1.0), so the
    reference's own clamp is a no-op there and ``log(1 - sigmoid(x))``
    becomes ``log(0) = -inf`` once a wrong-way logit passes ~+17 — the
    clip only ever "worked" in the torch code because FCOS training never
    drove logits that far.  ``log(1 - 5e-11) = -5e-11`` IS representable,
    so clipping ``log(pt)`` (computed stably via log_sigmoid) reproduces
    the intended window bit-for-bit where f32 defines it and stays finite
    with finite gradients everywhere (r5: the Adam RetinaNet run reached
    that regime and NaN'd before this fix)."""
    import jax

    t = targets_onehot
    # log(pt): log(p) = log_sigmoid(x) for targets, log(1-p) = log_sigmoid(-x)
    log_pt = jax.nn.log_sigmoid(logits) * t + jax.nn.log_sigmoid(-logits) * (1.0 - t)
    log_pt = jnp.clip(log_pt, jnp.log(5e-6), -5e-11)
    # (1 - pt) with the clip window's complement: pt in [5e-6, 1-5e-11]
    one_m_pt = jax_sigmoid(-logits) * t + jax_sigmoid(logits) * (1.0 - t)
    one_m_pt = jnp.clip(one_m_pt, 5e-11, 1.0 - 5e-6)
    w = alpha * t + (1.0 - alpha) * (1.0 - t)
    return -w * jnp.power(one_m_pt, gamma) * log_pt


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid.

    NOT ``1/(1+exp(-x))``: that form's autodiff emits ``exp(-x)`` which
    overflows to inf for x < -88 (f32), turning the gradient into
    ``inf * 0 = NaN``.  Focal training drives background logits exactly
    there (tens of thousands of negatives pushed toward p=0) — the r5
    RetinaNet convergence run NaN'd at step ~1.2k through this before the
    fix.  ``jax.nn.sigmoid`` computes the log-space form with a stable
    custom JVP; forward values are identical to the naive form after the
    callers' clipping."""
    import jax

    return jax.nn.sigmoid(x)


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
