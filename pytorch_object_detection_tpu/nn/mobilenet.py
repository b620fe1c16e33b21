"""MobileNetV2 backbone (flax.linen, NHWC).

The reference's wrapper (`/root/reference/model/backbone/MobileNet.py:7-19`)
is dead code with a broken import; this is a working from-scratch V2:
inverted residual blocks (expand 1x1 -> DW3x3 -> project 1x1, linear
bottleneck, residual when stride 1 & same width).  Returns (C3, C4, C5)
feature taps at strides (8, 16, 32) for detector use.
"""
from __future__ import annotations

from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import BatchNorm, Conv, DepthwiseConv

# (expand, channels, repeats, stride)
_V2_BLOCKS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


def relu6(x):
    import jax.numpy as jnp

    return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    features: int
    expand: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x
        if self.expand != 1:
            y = Conv(c * self.expand, 1, use_bias=False, name="expand")(y)
            y = relu6(BatchNorm(name="bn0")(y, train))
        y = DepthwiseConv(3, self.stride, use_bias=False, name="dw")(y)
        y = relu6(BatchNorm(name="bn1")(y, train))
        y = Conv(self.features, 1, use_bias=False, name="project")(y)
        y = BatchNorm(name="bn2")(y, train)
        if self.stride == 1 and c == self.features:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(32, 3, stride=2, use_bias=False, name="stem")(x)
        x = relu6(BatchNorm(name="stem_bn")(x, train))
        taps = []
        prev = x
        bid = 0
        for expand, ch, repeats, stride in _V2_BLOCKS:
            for r in range(repeats):
                s = stride if r == 0 else 1
                if s == 2:
                    taps.append(prev)
                prev = InvertedResidual(ch, expand, s, name=f"block{bid}")(prev, train)
                bid += 1
        taps.append(prev)
        # taps: [/2, /4, /8, /16, /32] maps (before each downsample + final)
        return tuple(taps[-3:])
