"""FCOS training-target assignment (label assignment), fully vectorized.

Re-implements the semantics of `FCOSGenTargets`
(`/root/reference/model/modules/head.py:211-316`) as a pure JAX function:

  * positives = locations whose ltrb offsets to a GT are all > 0 (inside the
    box), whose max offset falls in the level's limit range, and which lie
    within ``stride * radius`` of the GT center (center sampling);
  * ambiguous locations resolve to the minimum-area GT;
  * centerness = sqrt(min(l,r)*min(t,b) / (max(l,r)*max(t,b)));
  * negatives get class 0 and ``-1`` sentinels for centerness/regression
    (the downstream loss masks on ``cnt_target > -1``).

GT boxes/labels arrive padded to a static max count with ``-1`` (the same
sentinel convention as the reference collate_fn, dataset/voc.py:163-167);
padded GTs are naturally excluded because their ``r = x2 - x`` offset is
negative so ``offset_min > 0`` never holds.

Everything is statically shaped: per-level spatial dims come from the config,
so the whole assignment jit-compiles once and runs on the TPU inside the
training step (no host round trips, unlike the reference's device-side but
eagerly-launched torch version).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.boxes import level_coords

_INF_AREA = 99999999.0  # matches reference head.py:288


class FCOSTargets(NamedTuple):
    """Concatenated-over-levels training targets.

    cls: ``[B, N, 1]`` int32 class index (1-based; 0 = background)
    cnt: ``[B, N, 1]`` float32 centerness in [0, 1], ``-1`` for negatives
    reg: ``[B, N, 4]`` float32 ltrb offsets, ``-1`` for negatives
    """

    cls: jnp.ndarray
    cnt: jnp.ndarray
    reg: jnp.ndarray


def generate_level_targets(
    hw: Tuple[int, int],
    stride: int,
    limit_range: Tuple[float, float],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    radius: float = 1.5,
) -> FCOSTargets:
    """Targets for one pyramid level.

    gt_boxes: ``[B, M, 4]`` xyxy, padded with -1.
    gt_labels: ``[B, M]`` int, 1-based class ids, padded with -1.
    """
    h, w = hw
    coords = level_coords(h, w, stride)  # [HW, 2]
    x = coords[:, 0][None, :, None]  # [1, HW, 1]
    y = coords[:, 1][None, :, None]

    x1 = gt_boxes[..., 0][:, None, :]  # [B, 1, M]
    y1 = gt_boxes[..., 1][:, None, :]
    x2 = gt_boxes[..., 2][:, None, :]
    y2 = gt_boxes[..., 3][:, None, :]

    left = x - x1  # [B, HW, M]
    top = y - y1
    right = x2 - x
    bottom = y2 - y
    offsets = jnp.stack([left, top, right, bottom], axis=-1)  # [B, HW, M, 4]

    area = (left + right) * (top + bottom)  # [B, HW, M]
    off_min = jnp.min(offsets, axis=-1)
    off_max = jnp.max(offsets, axis=-1)

    mask_in_box = off_min > 0
    mask_level = (off_max > limit_range[0]) & (off_max <= limit_range[1])

    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    c_off_max = jnp.maximum(
        jnp.maximum(jnp.abs(x - cx), jnp.abs(y - cy)),
        0.0,
    )
    # Reference computes max of the four signed center offsets (head.py:278-284);
    # since (x-cx) and (cx-x) are negatives of each other, that max is |x-cx|
    # (resp. |y-cy|) and the overall max is the Chebyshev distance.
    mask_center = c_off_max < stride * radius

    mask_pos = mask_in_box & mask_level & mask_center  # [B, HW, M]

    area_masked = jnp.where(mask_pos, area, _INF_AREA)
    assign = jnp.argmin(area_masked, axis=-1)  # [B, HW]

    reg = jnp.take_along_axis(offsets, assign[..., None, None], axis=2)[:, :, 0, :]
    cls = jnp.take_along_axis(
        jnp.broadcast_to(gt_labels[:, None, :], area.shape), assign[..., None], axis=2
    )[..., 0]

    lr_min = jnp.minimum(reg[..., 0], reg[..., 2])
    lr_max = jnp.maximum(reg[..., 0], reg[..., 2])
    tb_min = jnp.minimum(reg[..., 1], reg[..., 3])
    tb_max = jnp.maximum(reg[..., 1], reg[..., 3])
    cnt = jnp.sqrt(
        jnp.maximum(lr_min * tb_min, 0.0) / (lr_max * tb_max + 1e-10)
    )

    has_pos = jnp.any(mask_pos, axis=-1)  # [B, HW]
    cls = jnp.where(has_pos, cls, 0).astype(jnp.int32)
    cnt = jnp.where(has_pos, cnt, -1.0)
    reg = jnp.where(has_pos[..., None], reg, -1.0)

    return FCOSTargets(cls[..., None], cnt[..., None].astype(jnp.float32), reg)


def generate_targets(
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    limit_ranges: Sequence[Tuple[float, float]],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    radius: float = 1.5,
) -> FCOSTargets:
    """Targets concatenated over all pyramid levels (reference head.py:218-232)."""
    assert len(level_shapes) == len(strides) == len(limit_ranges)
    per_level = [
        generate_level_targets(hw, s, r, gt_boxes, gt_labels, radius)
        for hw, s, r in zip(level_shapes, strides, limit_ranges)
    ]
    return FCOSTargets(
        jnp.concatenate([t.cls for t in per_level], axis=1),
        jnp.concatenate([t.cnt for t in per_level], axis=1),
        jnp.concatenate([t.reg for t in per_level], axis=1),
    )
