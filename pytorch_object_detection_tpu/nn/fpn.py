"""Feature pyramids: classic FPN, Half-Inverted-Stage FPN, lightweight MN-FPN.

All NHWC linen modules taking (C3, C4, C5) from the backbone and returning
five levels at strides (8, 16, 32, 64, 128).

  * :class:`FPN` — classic top-down P3-P7 with 1x1 laterals, 3x3 smoothing,
    stride-2 convs for P6/P7 (reference model/od/Fcos.py:61-91).
  * :class:`HisFPN` — the HISFCOS bidirectional pyramid: 1x1 transforms,
    7 HisBlocks across a top-down then bottom-up pass, with two extra levels
    maxpooled from the transformed C5 (reference model/od/HISFcos.py:115-179).
  * :class:`LightweightFPN` — MNFCOS pyramid of dilated-depthwise MNBlocks
    (reference model/od/MNFcos.py:222-256).

Parity deltas (documented, deliberate):
  * reference HisFPN declares GroupNorms then overwrites them with BatchNorms
    and re-uses ``gn2`` for two different laterals while ``gn3/act3`` are
    dead (HISFcos.py:137-145,157-163); we implement the effective
    computation: BN, with the C4/C3 lateral norm shared, and no dead module.
  * reference MN-FPN's k=5/7 blocks crash (see nn/layers.py MNBlock note);
    we same-pad.
"""
from __future__ import annotations

from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import (
    BatchNorm,
    Conv,
    HisBlock,
    MNBlock,
    maxpool2x2,
    relu,
    upsample2x,
)


class FPN(nn.Module):
    """Classic P3-P7 FPN (reference Fcos.py:61-91).

    Laterals and smoothing convs use kaiming-uniform(a=1) init
    (reference init_conv_kaiming applied at Fcos.py:75).
    """

    features: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        p5 = Conv(self.features, kernel=1, winit="fpn", name="lateral5")(c5)
        p4 = upsample2x(p5) + Conv(self.features, kernel=1, winit="fpn", name="lateral4")(c4)
        p4 = Conv(self.features, kernel=3, winit="fpn", name="smooth4")(p4)
        p3 = upsample2x(p4) + Conv(self.features, kernel=1, winit="fpn", name="lateral3")(c3)
        p3 = Conv(self.features, kernel=3, winit="fpn", name="smooth3")(p3)
        p5 = Conv(self.features, kernel=3, winit="fpn", name="smooth5")(p5)
        p6 = Conv(self.features, kernel=3, stride=2, winit="fpn", name="down6")(p5)
        p7 = Conv(self.features, kernel=3, stride=2, winit="fpn", name="down7")(relu(p6))
        return p3, p4, p5, p6, p7


class HisFPN(nn.Module):
    """Half-inverted-stage FPN (reference HISFcos.py:115-179).

    Top-down: transform C5 -> HisBlock -> upsample, add transformed C4 ->
    HisBlock -> upsample, add transformed C3 -> HisBlock (P3/stride 8).
    Bottom-up: maxpool back down with residual adds through HisBlocks,
    plus two extra levels seeded by maxpools of the transformed C5.
    Returns (p3, p4, p5, p6, p7) at strides (8, 16, 32, 64, 128).
    """

    features: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        f = self.features
        lat_norm = BatchNorm(name="bn_lat_shared")  # shared across C4/C3 laterals

        t5 = Conv(f, kernel=1, use_bias=False, name="tf1")(c5)
        t5 = relu(BatchNorm(name="bn_tf1")(t5, train))
        seed6 = maxpool2x2(t5)  # /64
        seed7 = maxpool2x2(seed6)  # /128

        d5 = HisBlock(f, name="his1")(t5, train)  # /32
        t4 = Conv(f, kernel=1, use_bias=False, name="tf2")(c4)
        t4 = relu(lat_norm(t4, train))
        d4 = HisBlock(f, name="his2")(upsample2x(d5) + t4, train)  # /16
        t3 = Conv(f, kernel=1, use_bias=False, name="tf3")(c3)
        t3 = relu(lat_norm(t3, train))
        p3 = HisBlock(f, name="his3")(upsample2x(d4) + t3, train)  # /8 (final P3)

        p4 = HisBlock(f, name="his4")(maxpool2x2(p3) + d4, train)  # /16
        p5 = HisBlock(f, name="his5")(maxpool2x2(p4) + d5, train)  # /32
        p6 = HisBlock(f, name="his6")(maxpool2x2(p5) + seed6, train)  # /64
        p7 = HisBlock(f, name="his7")(maxpool2x2(p6) + seed7, train)  # /128
        return p3, p4, p5, p6, p7


class LightweightFPN(nn.Module):
    """MNFCOS lightweight pyramid (reference MNFcos.py:222-256).

    1x1 laterals then MNBlocks: P5 first, top-down adds to P4/P3,
    maxpool descents to P6/P7.
    """

    features: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        f = self.features
        l5 = Conv(f, kernel=1, name="lateral5")(c5)
        l4 = Conv(f, kernel=1, name="lateral4")(c4)
        l3 = Conv(f, kernel=1, name="lateral3")(c3)
        p5 = MNBlock(f, kernel=5, dilation=2, alpha=2, name="mnb5")(l5, train)
        p4 = MNBlock(f, kernel=3, dilation=2, alpha=2, name="mnb4")(upsample2x(p5) + l4, train)
        p3 = MNBlock(f, kernel=3, dilation=1, alpha=2, name="mnb3")(upsample2x(p4) + l3, train)
        p6 = MNBlock(f, kernel=5, dilation=1, alpha=2, name="mnb6")(maxpool2x2(p5), train)
        p7 = MNBlock(f, kernel=7, dilation=1, alpha=2, name="mnb7")(maxpool2x2(p6), train)
        return p3, p4, p5, p6, p7
