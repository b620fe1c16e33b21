"""VGG-16 backbone, SSD flavour (flax.linen, NHWC).

Covers the reference `VGG16` (`/root/reference/model/backbone/vgg16.py:8-31`):
features through conv4_3 and conv5_3 with ceil-mode pool3, then the SSD
extras — pool5 3x3/1, conv6 3x3 dilation-6 -> 1024, conv7 1x1 -> 1024.
Returns (conv4_3 relu out [512ch, /8], conv7 out [1024ch, /16]).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import Conv, relu


def _maxpool(x, window=2, stride=2, ceil: bool = False, pad_same: bool = False):
    if pad_same:  # 3x3/1 'same' pool (SSD pool5)
        return nn.max_pool(x, (window, window), strides=(stride, stride), padding=[(1, 1), (1, 1)])
    if ceil:
        h, w = x.shape[1:3]
        ph = (stride - h % stride) % stride
        pw = (stride - w % stride) % stride
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class VGG16(nn.Module):
    ceil_mode_pool3: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        conv4_3 = None
        for stage, (ch, n) in enumerate(cfg):
            for i in range(n):
                x = relu(Conv(ch, 3, name=f"conv{stage + 1}_{i + 1}")(x))
            if stage == 3:
                conv4_3 = x  # relu(conv4_3), 512ch, /8
            if stage < 4:
                x = _maxpool(x, ceil=(stage == 2 and self.ceil_mode_pool3))
        x = _maxpool(x, window=3, stride=1, pad_same=True)  # pool5
        x = relu(Conv(1024, 3, dilation=6, name="conv6")(x))
        x = relu(Conv(1024, 1, name="conv7")(x))
        return conv4_3, x
