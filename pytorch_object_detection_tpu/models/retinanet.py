"""RetinaNet (anchor-based, 9 anchors/cell) — reference scaffold completed.

Structure follows `/root/reference/model/od/RetinaNet.py:9-146`: ResNet-50
C3-C5, RetinaNet FPN (P6 strided conv from C5, P7 from relu(P6)),
4-conv regression and classification subnets shared across levels.

Deltas (documented):
  * the reference's ConvBnAct silently replaces every conv with a depthwise
    conv (modules.py:16-24) — we use real convs (the published RetinaNet);
  * the reference applies sigmoid inside the net (RetinaNet.py:102) — we
    return logits (loss/decode apply sigmoid), with prior-bias init on the
    classification output;
  * anchors come from ops/anchors.py (the reference's Anchor module is
    host-side numpy with print statements, RetinaNet.py:127-146).

Unlike the reference, the training path exists: pair the outputs with
ops/anchors.encode_targets + retinanet_loss.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from pytorch_object_detection_tpu.models.heads import prior_bias
from pytorch_object_detection_tpu.nn.layers import BatchNorm, Conv, relu, upsample2x
from pytorch_object_detection_tpu.nn.resnet import ResNet50


class RetinaFPN(nn.Module):
    """Reference FeaturePyramid (RetinaNet.py:28-60): conv+BN+ReLU blocks,
    P6 = strided conv on C5, P7 = strided conv on relu(P6)."""

    features: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats

        def cba(x, features, kernel, stride, name):
            x = Conv(features, kernel, stride, use_bias=False, name=f"{name}_conv")(x)
            return relu(BatchNorm(name=f"{name}_bn")(x, train))

        p5 = cba(c5, self.features, 1, 1, "p5_1")
        p5_up = upsample2x(p5)
        p5_out = cba(p5, self.features, 3, 1, "p5_2")
        p4 = cba(c4, self.features, 1, 1, "p4_1") + p5_up
        p4_up = upsample2x(p4)
        p4_out = cba(p4, self.features, 3, 1, "p4_2")
        p3 = cba(c3, self.features, 1, 1, "p3_1") + p4_up
        p3_out = cba(p3, self.features, 3, 1, "p3_2")
        p6 = cba(c5, self.features, 3, 2, "p6")
        p7 = cba(relu(p6), self.features, 3, 2, "p7")
        return p3_out, p4_out, p5_out, p6, p7


class SubNet(nn.Module):
    """4x(conv3x3+ReLU) tower + output conv, shared across levels."""

    out_channels: int
    features: int = 256
    bias_const: float | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = relu(Conv(self.features, 3, winit="head", name=f"conv{i}")(x))
        return Conv(
            self.out_channels, 3, winit="head", bias_const=self.bias_const, name="out"
        )(x)


class RetinaNet(nn.Module):
    num_classes: int = 80
    features: int = 256
    num_anchors: int = 9
    freeze_bn: bool = True

    @nn.compact
    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (loc_preds [B, sum(HWA), 4], cls_logits [B, sum(HWA), C])."""
        bn_train = train and not self.freeze_bn
        feats = ResNet50(name="backbone")(images, bn_train)
        levels = RetinaFPN(self.features, name="fpn")(feats, bn_train)
        reg_net = SubNet(self.num_anchors * 4, self.features, name="regression")
        cls_net = SubNet(
            self.num_anchors * self.num_classes,
            self.features,
            bias_const=prior_bias(0.01),
            name="classification",
        )
        b = images.shape[0]
        regs, clss = [], []
        for lvl in levels:
            regs.append(reg_net(lvl).reshape(b, -1, 4))
            clss.append(cls_net(lvl).reshape(b, -1, self.num_classes))
        return jnp.concatenate(regs, axis=1), jnp.concatenate(clss, axis=1)

    def level_shapes(self, hw: Tuple[int, int]):
        return [(-(-hw[0] // s), -(-hw[1] // s)) for s in (8, 16, 32, 64, 128)]
