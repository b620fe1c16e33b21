"""Synthetic detection batches (for benchmarks, smoke tests, dry runs).

Produces the exact batch layout the trainer consumes: NHWC images, GT boxes
padded to a static max with ``-1`` sentinels, 1-based integer labels padded
with ``-1`` — the same convention the reference's collate_fn establishes
(dataset/voc.py:141-173).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def synthetic_batch(
    rng,
    batch_size: int = 8,
    hw: Tuple[int, int] = (512, 512),
    num_classes: int = 20,
    max_boxes: int = 32,
    mean_boxes: int = 6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random images + plausible random GT boxes/labels."""
    h, w = hw
    k_img, k_n, k_xy, k_wh, k_cls = jax.random.split(rng, 5)
    images = jax.random.uniform(k_img, (batch_size, h, w, 3), jnp.float32)

    n_boxes = jax.random.randint(k_n, (batch_size,), 1, min(mean_boxes * 2, max_boxes) + 1)
    cx = jax.random.uniform(k_xy, (batch_size, max_boxes, 2)) * jnp.array([w, h]) * 0.8 + jnp.array([w, h]) * 0.1
    bwh = jax.random.uniform(k_wh, (batch_size, max_boxes, 2), minval=0.05, maxval=0.5) * jnp.array([w, h])
    x1y1 = jnp.maximum(cx - bwh / 2, 0.0)
    x2y2 = jnp.minimum(cx + bwh / 2, jnp.array([w - 1.0, h - 1.0]))
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    labels = jax.random.randint(k_cls, (batch_size, max_boxes), 1, num_classes + 1)

    valid = jnp.arange(max_boxes)[None, :] < n_boxes[:, None]
    boxes = jnp.where(valid[..., None], boxes, -1.0)
    labels = jnp.where(valid, labels, -1).astype(jnp.int32)
    return images, boxes, labels
