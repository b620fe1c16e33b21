"""SSD300 (VGG-16, multibox) — reference scaffold completed and fixed.

Structure follows `/root/reference/model/od/ssd.py:29-138`: VGG16 backbone,
L2Norm on conv4_3 (learnable per-channel scale, init 20), four extra
feature layers, per-level loc/conf heads with (4, 6, 6, 6, 4, 4) default
boxes, and the SSD default-box generator.

Reference bugs fixed (scaffold never ran there):
  * ssd.py:59-61 missing comma makes the DefaultBox ctor index a list with a
    list (crash);
  * the conf head outputs ``num_class*4`` for every level regardless of its
    anchor count (ssd.py:101) — correct is ``num_anchors*num_class``;
  * head.py:176-208 DefaultBoxGenerator rebinds `wh_pairs` per iteration.

Outputs are concatenated ``loc [B, 8732, 4]`` / ``conf logits [B, 8732, C]``
matching :func:`default_boxes`; pair with ops/anchors.encode/decode using
these boxes for training/inference.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import Conv, relu
from pytorch_object_detection_tpu.nn.vgg import VGG16

FEATURE_SIZES = (38, 19, 10, 5, 3, 1)
STEPS = (8, 16, 32, 64, 100, 300)
MIN_SIZES = (30, 60, 111, 162, 213, 264)
MAX_SIZES = (60, 111, 162, 213, 264, 315)
ASPECT_RATIOS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
NUM_ANCHORS = (4, 6, 6, 6, 4, 4)


def default_boxes(img_size: int = 300) -> jnp.ndarray:
    """SSD default boxes, xyxy in absolute pixels, clipped to the image.

    (cx, cy) on the cell grid; per cell: s_k square, sqrt(s_k*s_k+1) square,
    and (s_k*sqrt(ar), s_k/sqrt(ar)) pairs — the classic 8732-box layout.
    """
    boxes: List[Tuple[float, float, float, float]] = []
    for k, f in enumerate(FEATURE_SIZES):
        f_k = img_size / STEPS[k]
        s_k = MIN_SIZES[k] / img_size
        s_k_prime = math.sqrt(s_k * (MAX_SIZES[k] / img_size))
        for i in range(f):
            for j in range(f):
                cx = (j + 0.5) / f_k
                cy = (i + 0.5) / f_k
                boxes.append((cx, cy, s_k, s_k))
                boxes.append((cx, cy, s_k_prime, s_k_prime))
                for ar in ASPECT_RATIOS[k]:
                    r = math.sqrt(ar)
                    boxes.append((cx, cy, s_k * r, s_k / r))
                    boxes.append((cx, cy, s_k / r, s_k * r))
    arr = np.clip(np.asarray(boxes, np.float32), 0.0, 1.0)
    cx, cy, w, h = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1) * img_size
    return jnp.asarray(np.clip(xyxy, 0.0, img_size))


class L2Norm(nn.Module):
    """Channelwise L2 normalization with learnable scale (init 20) on
    conv4_3 (reference SSDL2Norm, ssd.py:8-26)."""

    scale_init: float = 20.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda _k: jnp.full((x.shape[-1],), self.scale_init, jnp.float32)
        )
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10
        return x / norm * scale


class ExtraLayer(nn.Module):
    """1x1 squeeze + 3x3 conv (reference ExtractModule, ssd.py:80-94);
    stride-2 layers pad 1, stride-1 layers are VALID (shrink 5->3->1)."""

    mid: int
    out: int
    stride: int = 1
    pad: bool = False

    @nn.compact
    def __call__(self, x):
        x = relu(Conv(self.mid, 1, name="conv1")(x))
        padding = [(1, 1), (1, 1)] if self.pad else "VALID"
        x = relu(
            nn.Conv(self.out, (3, 3), (self.stride, self.stride), padding=padding, name="conv2")(x)
        )
        return x


class SSD300(nn.Module):
    num_classes: int = 21

    @nn.compact
    def __call__(self, images, train: bool = False):
        c4_3, c7 = VGG16(name="backbone")(images, train)
        f1 = L2Norm(name="l2norm")(c4_3)  # 38x38, 512
        f2 = c7  # 19x19, 1024
        f3 = ExtraLayer(256, 512, 2, pad=True, name="extra1")(f2)  # 10x10
        f4 = ExtraLayer(128, 256, 2, pad=True, name="extra2")(f3)  # 5x5
        f5 = ExtraLayer(128, 256, 1, pad=False, name="extra3")(f4)  # 3x3
        f6 = ExtraLayer(128, 256, 1, pad=False, name="extra4")(f5)  # 1x1

        b = images.shape[0]
        locs, confs = [], []
        for i, (feat, na) in enumerate(zip((f1, f2, f3, f4, f5, f6), NUM_ANCHORS)):
            loc = Conv(na * 4, 3, name=f"loc{i}")(feat)
            conf = Conv(na * self.num_classes, 3, name=f"conf{i}")(feat)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)
