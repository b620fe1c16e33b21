"""FCOS-family detector assemblies (flagship: HISFCOS).

Each model is backbone -> pyramid -> shared head, returning per-level NHWC
(cls, cnt, reg) lists — the layout the target generator, loss, and decoder
consume.  Inputs are NHWC float images (normalized); bf16 compute is applied
by the trainer via a dtype policy, params stay fp32.

Reference assemblies:
  * FCOS      — ResNet50 + classic FPN + 4-conv towers (model/od/Fcos.py:12-133)
  * HISFCOS   — ResNet50 + HisFPN + inverted-bottleneck head
                (model/od/HISFcos.py:45-74), the paper model (VOC mAP 0.814)
  * MNFCOS    — ResNet50 + lightweight MN pyramid + MN head
                (model/od/MNFcos.py:11-36)

``freeze_bn=True`` (the reference's only trained configuration,
HISFcos.py:57-68) keeps every BatchNorm on stored statistics; the trainer
additionally masks BN params (and optionally frozen backbone stages) out of
the optimizer.
"""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from pytorch_object_detection_tpu.models.heads import FCOSHead, HISHead, MNHead
from pytorch_object_detection_tpu.nn.fpn import FPN, HisFPN, LightweightFPN
from pytorch_object_detection_tpu.nn.resnet import ResNet50


class FCOS(nn.Module):
    num_classes: int = 20
    features: int = 256
    freeze_bn: bool = True
    backbone: str = "resnet50"  # or "efficientnet-b0"
    # frozen backbone stages (reference freeze_stages): the optimizer mask
    # lives in train/trainer.param_labels; this adds the matching gradient
    # barrier so the frozen stages' backward is not computed at all
    frozen_stages: int = 0

    @nn.compact
    def __call__(self, images, train: bool = False):
        bn_train = train and not self.freeze_bn
        if self.backbone == "efficientnet-b0":
            from pytorch_object_detection_tpu.nn.efficientnet import EfficientNet

            feats = EfficientNet.b0(name="backbone")(images, bn_train)[-3:]
        else:
            feats = ResNet50(grad_barrier_stages=self.frozen_stages,
                             name="backbone")(images, bn_train)
        levels = FPN(self.features, name="fpn")(feats, bn_train)
        return FCOSHead(self.num_classes, self.features, name="head")(levels)


class HISFCOS(nn.Module):
    """Half-Inverted-Stage FCOS — the flagship model.

    ``stem_mode='s2d'`` selects the TPU space-to-depth ResNet stem (exact
    rewrite; pretrained conv7 weights convert via nn/resnet.s2d_stem_kernel).
    """

    num_classes: int = 20
    features: int = 256
    freeze_bn: bool = True
    stem_mode: str = "conv7"
    # reference HISFcos.py:57-68 freezes stage 1; barrier skips its backward
    frozen_stages: int = 0

    @nn.compact
    def __call__(self, images, train: bool = False):
        bn_train = train and not self.freeze_bn
        feats = ResNet50(stem_mode=self.stem_mode,
                         grad_barrier_stages=self.frozen_stages,
                         name="backbone")(images, bn_train)
        levels = HisFPN(self.features, name="fpn")(feats, bn_train)
        return HISHead(self.num_classes, self.features, name="head")(levels)


class MNFCOS(nn.Module):
    num_classes: int = 20
    features: int = 256
    freeze_bn: bool = True
    frozen_stages: int = 0

    @nn.compact
    def __call__(self, images, train: bool = False):
        bn_train = train and not self.freeze_bn
        feats = ResNet50(grad_barrier_stages=self.frozen_stages,
                         name="backbone")(images, bn_train)
        levels = LightweightFPN(self.features, name="fpn")(feats, bn_train)
        return MNHead(self.num_classes, self.features, name="head")(levels, bn_train)


def default_strides() -> Sequence[int]:
    return (8, 16, 32, 64, 128)
