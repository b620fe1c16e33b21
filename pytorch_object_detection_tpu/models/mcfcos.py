"""MC-FCOS — the reference's experimental 4-level CSP/MBConv FCOS variant.

Structure follows `/root/reference/model/od/Mc_Fcos.py:9-223`: ResNet-50,
a CSP-style half-split MBConv block, top-down FeatureFusion (concat + 1x1),
an MBConv FPN, a FeatureRefine stage producing 4 levels at strides
(8, 16, 32, 64), and a 4-conv head WITHOUT ScaleExp (raw reg output — the
reference never trained this model; we keep its shape for capability parity).

Delta: the reference re-uses a single BatchNorm module across several convs
(Mc_Fcos.py:73-86, 212-219 — one `bn` normalizing different distributions);
we give each conv its own norm (the evident intent).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import (
    BatchNorm,
    Conv,
    DepthwiseConv,
    SEBlock,
    maxpool2x2,
    silu,
    upsample2x,
)
from pytorch_object_detection_tpu.nn.resnet import ResNet50


class MCBlock(nn.Module):
    """CSP half-split MBConv (reference Mc_Fcos.py:56-87)."""

    features: int
    se_reduction: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = Conv(c // 2, 1, name="pw1")(x)
        y = silu(BatchNorm(name="bn1")(y, train))
        skip = y
        y = DepthwiseConv(3, name="dw")(y)
        y = silu(BatchNorm(name="bn2")(y, train))
        y = SEBlock(self.se_reduction, name="se")(y)
        y = Conv(c // 2, 1, name="pw3")(y)
        y = silu(BatchNorm(name="bn3")(y, train))
        skip = Conv(c // 2, 1, name="pw4")(skip)
        skip = silu(BatchNorm(name="bn4")(skip, train))
        y = jnp.concatenate([y, skip], axis=-1)
        y = Conv(self.features, 1, name="pw5")(y)
        return silu(BatchNorm(name="bn5")(y, train))


class MCHead(nn.Module):
    """4x(conv3x3-BN-SiLU) + bias-free cls/cnt/reg convs (Mc_Fcos.py:188-223)."""

    num_classes: int
    features: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = Conv(self.features, 3, use_bias=False, name=f"conv{i}")(x)
            x = silu(BatchNorm(name=f"bn{i}")(x, train))
        cls = Conv(self.num_classes, 3, use_bias=False, name="cls")(x)
        cnt = Conv(1, 3, use_bias=False, name="cnt")(x)
        reg = Conv(4, 3, use_bias=False, name="reg")(x)
        return cls, cnt, reg


class MC_FCOS(nn.Module):
    num_classes: int = 20
    features: int = 256
    freeze_bn: bool = True

    @nn.compact
    def __call__(self, images, train: bool = False):
        bn_train = train and not self.freeze_bn
        f = self.features
        c3, c4, c5 = ResNet50(name="backbone")(images, bn_train)  # /8 /16 /32

        # extra coarse level from pooled C5
        x4 = MCBlock(f, name="mb_top")(maxpool2x2(c5), bn_train)  # /64

        # FeatureFusionModule: top-down concat fusion (Mc_Fcos.py:90-117)
        t = jnp.concatenate([c4, upsample2x(c5)], axis=-1)
        t = Conv(f, 1, name="ffm_pw1")(t)
        x2 = MCBlock(f, name="ffm_mb1")(t, bn_train)  # /16
        t = jnp.concatenate([c3, upsample2x(c4)], axis=-1)
        t = Conv(f, 1, name="ffm_pw2")(t)
        x1 = MCBlock(f, name="ffm_mb2")(t, bn_train)  # /8

        x3 = Conv(f, 1, use_bias=False, name="tf1_conv")(c5)
        x3 = silu(BatchNorm(name="tf1_bn")(x3, bn_train))  # /32

        # MBConv FPN over (x1 /8, x2 /16, x3 /32) -> (p1 /32, p2 /16, p3 /8)
        p1 = MCBlock(f, name="fpn_mb1")(x3, bn_train)
        p2 = MCBlock(f, name="fpn_mb2")(upsample2x(p1) + x2, bn_train)
        p3 = MCBlock(f, name="fpn_mb3")(upsample2x(p2) + x1, bn_train)

        # FeatureRefine -> 4 heads at strides 8, 16, 32, 64 (Mc_Fcos.py:144-185)
        c1 = jnp.concatenate([upsample2x(p1), p2], axis=-1)  # /16, 2f
        c1 = MCBlock(f, name="refine_mb1")(c1, bn_train)
        c1 = jnp.concatenate([c1, maxpool2x2(p3)], axis=-1)  # /16, 2f
        c1 = MCBlock(f, name="refine_mb2")(c1, bn_train)
        h1 = upsample2x(c1) + p3  # /8
        h2 = Conv(f, 3, use_bias=False, name="refine_conv")(c1) + p2  # /16
        d = maxpool2x2(c1)
        h3 = d + p1  # /32
        h4 = maxpool2x2(d) + x4  # /64

        head = MCHead(self.num_classes, f, name="head")
        cls_out, cnt_out, reg_out = [], [], []
        for lvl in (h1, h2, h3, h4):
            cls, cnt, reg = head(lvl, bn_train)
            cls_out.append(cls)
            cnt_out.append(cnt)
            reg_out.append(reg)
        return cls_out, cnt_out, reg_out
