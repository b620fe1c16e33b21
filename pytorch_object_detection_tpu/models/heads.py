"""Detection heads shared across pyramid levels.

Each head maps the 5 FPN levels to per-level (cls, cnt, reg) NHWC outputs;
parameters are shared across levels except the per-level ScaleExp on the
regression branch.  Regression outputs are already ``exp``-activated ltrb
distances (the ScaleExp module), matching the reference.

  * :class:`FCOSHead` — 4x(conv3x3-GN32-ReLU) cls/reg towers, 3x3 preds,
    normal(0.01) init, prior-bias on cls (reference model/od/Fcos.py:94-133).
  * :class:`HISHead` — shared inverted-bottleneck stem (PW-up 2f -> DW ->
    PW-down f, residual) then 1x(conv-GN-ReLU) towers, ScaleExp(1.2)
    (reference model/od/HISFcos.py:182-229).
  * :class:`MNHead` — 2 shared MNBlocks, 1x(conv-GN-SiLU) towers, 1x1 preds
    (reference model/od/MNFcos.py:259-297).
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import (
    Conv,
    DepthwiseConv,
    GroupNorm32,
    MNBlock,
    ScaleExp,
    relu,
    silu,
)

LevelOutputs = Tuple[List, List, List]


def prior_bias(prior: float = 0.01) -> float:
    """Focal-loss classification bias init: ``-log((1-p)/p)``."""
    return -math.log((1.0 - prior) / prior)


class FCOSHead(nn.Module):
    num_classes: int
    features: int = 256
    num_convs: int = 4
    prior: float = 0.01
    scale_init: float = 1.0
    num_levels: int = 5

    @nn.compact
    def __call__(self, levels) -> LevelOutputs:
        cls_tower = [
            (
                Conv(self.features, 3, use_bias=False, winit="head", name=f"cls_tower{i}"),
                GroupNorm32(act="relu", name=f"cls_gn{i}"),
            )
            for i in range(self.num_convs)
        ]
        reg_tower = [
            (
                Conv(self.features, 3, use_bias=False, winit="head", name=f"reg_tower{i}"),
                GroupNorm32(act="relu", name=f"reg_gn{i}"),
            )
            for i in range(self.num_convs)
        ]
        cls_pred = Conv(self.num_classes, 3, winit="head", bias_const=prior_bias(self.prior), name="cls_pred")
        cnt_pred = Conv(1, 3, winit="head", name="cnt_pred")
        reg_pred = Conv(4, 3, winit="head", name="reg_pred")
        scales = [ScaleExp(self.scale_init, name=f"scale{i}") for i in range(self.num_levels)]

        cls_out, cnt_out, reg_out = [], [], []
        for i, x in enumerate(levels):
            c = x
            for conv, gn in cls_tower:
                c = gn(conv(c))
            r = x
            for conv, gn in reg_tower:
                r = gn(conv(r))
            cls_out.append(cls_pred(c))
            cnt_out.append(cnt_pred(r))
            reg_out.append(scales[i](reg_pred(r)))
        return cls_out, cnt_out, reg_out


class HISHead(nn.Module):
    num_classes: int
    features: int = 256
    prior: float = 0.01
    scale_init: float = 1.2
    num_levels: int = 5

    @nn.compact
    def __call__(self, levels) -> LevelOutputs:
        f = self.features
        pw1 = Conv(2 * f, 1, use_bias=False, name="stem_pw1")
        gn1 = GroupNorm32(act="relu", name="stem_gn1")
        dw = DepthwiseConv(3, name="stem_dw")
        gn2 = GroupNorm32(act="silu", name="stem_gn2")
        pw2 = Conv(f, 1, use_bias=True, name="stem_pw2")
        cls_conv = Conv(f, 3, use_bias=False, name="cls_tower0")
        cls_gn = GroupNorm32(act="relu", name="cls_gn0")
        reg_conv = Conv(f, 3, use_bias=False, name="reg_tower0")
        reg_gn = GroupNorm32(act="relu", name="reg_gn0")
        cls_pred = Conv(self.num_classes, 3, bias_const=prior_bias(self.prior), name="cls_pred")
        cnt_pred = Conv(1, 3, name="cnt_pred")
        reg_pred = Conv(4, 3, name="reg_pred")
        scales = [ScaleExp(self.scale_init, name=f"scale{i}") for i in range(self.num_levels)]

        cls_out, cnt_out, reg_out = [], [], []
        for i, x in enumerate(levels):
            y = gn1(pw1(x))
            y = gn2(dw(y))
            y = pw2(y) + x  # inverted-bottleneck stem, residual
            c = cls_gn(cls_conv(y))
            r = reg_gn(reg_conv(y))
            cls_out.append(cls_pred(c))
            cnt_out.append(cnt_pred(r))
            reg_out.append(scales[i](reg_pred(r)))
        return cls_out, cnt_out, reg_out


class MNHead(nn.Module):
    num_classes: int
    features: int = 256
    prior: float = 0.01
    scale_init: float = 1.0
    num_levels: int = 5

    @nn.compact
    def __call__(self, levels, train: bool = False) -> LevelOutputs:
        f = self.features
        block1 = MNBlock(f, 3, 2, 2, name="block1")
        block2 = MNBlock(f, 3, 2, 2, name="block2")
        cls_conv = Conv(f, 3, use_bias=False, name="cls_tower0")
        cls_gn = GroupNorm32(act="silu", name="cls_gn0")
        reg_conv = Conv(f, 3, use_bias=False, name="reg_tower0")
        reg_gn = GroupNorm32(act="silu", name="reg_gn0")
        cls_pred = Conv(self.num_classes, 1, bias_const=prior_bias(self.prior), name="cls_pred")
        cnt_pred = Conv(1, 1, name="cnt_pred")
        reg_pred = Conv(4, 1, name="reg_pred")
        scales = [ScaleExp(self.scale_init, name=f"scale{i}") for i in range(self.num_levels)]

        cls_out, cnt_out, reg_out = [], [], []
        for i, x in enumerate(levels):
            y = block2(block1(x, train), train)
            c = cls_gn(cls_conv(y))
            r = reg_gn(reg_conv(y))
            cls_out.append(cls_pred(c))
            cnt_out.append(cnt_pred(r))
            reg_out.append(scales[i](reg_pred(r)))
        return cls_out, cnt_out, reg_out
