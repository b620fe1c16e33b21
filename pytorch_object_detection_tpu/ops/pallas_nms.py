"""Pallas TPU kernel for greedy NMS (fused IoU + suppression, zero HBM IoU).

The XLA path (ops/nms.py) materializes the [B, K, K] IoU matrix in HBM and
re-reads it every fixpoint iteration.  This kernel keeps everything in VMEM:
one grid step per image computes the IoU matrix on-chip ([K, K] fp32, 4 MB
at K=1024) and runs the prefix-stabilizing suppression fixpoint as MXU
matvecs over it — the iteration ``suppressed = keep @ (iou > t)`` is a
[1,K] x [K,K] product.

Boxes arrive transposed ``[B, 4, K]`` (lane dim = K: VPU-friendly layout)
and must already be score-sorted with class offsets applied (same contract
as ops/nms.nms_keep_mask).  K must be a multiple of 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold: float, max_iters: int):
    k = boxes_ref.shape[-1]
    x1 = boxes_ref[0, 0, :]  # [K]
    y1 = boxes_ref[0, 1, :]
    x2 = boxes_ref[0, 2, :]
    y2 = boxes_ref[0, 3, :]

    # pairwise IoU in VMEM: rows = suppressor i, cols = candidate j
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    area = (x2 - x1) * (y2 - y1)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.where(union > 0, union, 1.0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # overlap matrix as f32 so the fixpoint step rides the MXU
    overlaps = jnp.where((iou > iou_threshold) & (row_ids < col_ids), 1.0, 0.0)

    valid = valid_ref[0, 0, :]  # [K] f32 0/1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        keep, _, it = state
        suppressed = jnp.dot(
            keep.reshape(1, k), overlaps, preferred_element_type=jnp.float32
        ).reshape(k)
        new_keep = valid * jnp.where(suppressed > 0.0, 0.0, 1.0)
        changed = jnp.any(new_keep != keep)
        return new_keep, changed, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True), 0))
    keep_ref[0, 0, :] = keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret", "batch_tile"))
def pallas_nms_keep_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.6,
    interpret: bool = False,
    batch_tile: int = 8,
) -> jnp.ndarray:
    """Greedy-NMS keep mask via the Pallas kernel.

    boxes ``[B, K, 4]`` score-sorted (class offsets pre-applied),
    valid ``[B, K]`` bool.  K is padded to a multiple of 128 internally.
    The batch is processed in ``batch_tile``-image tiles through one
    compiled kernel instance (`lax.map`): Mosaic's compile time grows
    super-linearly with grid size, so a fixed tile keeps compiles at ~1s
    while runtime stays kernel-bound.
    """
    b, k = valid.shape
    k_pad = -(-k // 128) * 128
    boxes_t = jnp.swapaxes(boxes, 1, 2)  # [B, 4, K]
    if k_pad != k:
        boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 0), (0, k_pad - k)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad - k)))
    valid_f = valid.astype(jnp.float32).reshape(b, 1, k_pad)

    tile = min(batch_tile, b)
    b_pad = -(-b // tile) * tile
    if b_pad != b:
        boxes_t = jnp.pad(boxes_t, ((0, b_pad - b), (0, 0), (0, 0)))
        valid_f = jnp.pad(valid_f, ((0, b_pad - b), (0, 0), (0, 0)))

    kernel = functools.partial(
        _nms_kernel, iou_threshold=float(iou_threshold), max_iters=k_pad
    )
    call = pl.pallas_call(
        kernel,
        grid=(tile,),
        in_specs=[
            pl.BlockSpec((1, 4, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tile, 1, k_pad), jnp.float32),
        interpret=interpret,
    )

    n_tiles = b_pad // tile
    boxes_tiles = boxes_t.reshape(n_tiles, tile, 4, k_pad)
    valid_tiles = valid_f.reshape(n_tiles, tile, 1, k_pad)
    keep = jax.lax.map(lambda args: call(*args), (boxes_tiles, valid_tiles))
    return keep.reshape(b_pad, k_pad)[:b, :k] > 0.5


def pallas_batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Class-aware variant (coordinate-offset trick), drop-in for
    ops/nms.batched_class_nms."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0))
    offsets = classes.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[..., None]
    return pallas_nms_keep_mask(shifted, valid, iou_threshold, interpret=interpret)
