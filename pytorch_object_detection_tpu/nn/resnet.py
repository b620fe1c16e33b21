"""ResNet-50 backbone (flax.linen, NHWC).

Structurally equivalent to the torchvision resnet50 the reference wraps
(`/root/reference/model/backbone/resnet50.py:9-97`): 7x7/2 stem + 3x3/2
maxpool, bottleneck stages [3,4,6,3] with widths [64,128,256,512] (x4
expansion), downsample convs on the first block of each stage.  Returns
(C3, C4, C5) = (512ch /8, 1024ch /16, 2048ch /32), the taps both ResNet50
(re_layer=3) and ResNet50v2 (feature-extractor) variants expose.

Param count without the classifier head: 23,508,032 — matches the
reference's recorded summary (resnet50.py:44-48); asserted in tests.

Pretrained torchvision weights load through
:func:`..train.checkpoints.torchvision_resnet50_to_pytree` (forward parity
vs a functional torch oracle tested in tests/test_torch_parity.py); with
`frozen_stages=1` (reference
freeze_stages) the stem + stage1 params are masked out of the optimizer,
and all BatchNorms run off stored statistics when the model is built with
``freeze_bn=True`` (the reference's only trained configuration).
"""
from __future__ import annotations

from typing import Tuple

import jax
from flax import linen as nn

from pytorch_object_detection_tpu.nn.layers import BatchNorm, Conv, relu


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut."""

    width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.width * 4
        y = Conv(self.width, kernel=1, use_bias=False, winit="resnet", name="conv1")(x)
        y = relu(BatchNorm(name="bn1")(y, train))
        y = Conv(self.width, kernel=3, stride=self.stride, use_bias=False, winit="resnet", name="conv2")(y)
        y = relu(BatchNorm(name="bn2")(y, train))
        y = Conv(out_ch, kernel=1, use_bias=False, winit="resnet", name="conv3")(y)
        y = BatchNorm(name="bn3")(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = Conv(out_ch, kernel=1, stride=self.stride, use_bias=False, winit="resnet", name="downsample_conv")(x)
            x = BatchNorm(name="downsample_bn")(x, train)
        return relu(x + y)


def space_to_depth(x, block: int = 2):
    """[B, H, W, C] -> [B, H/b, W/b, b*b*C] (dy, dx, c channel order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def s2d_stem_kernel(conv7: "jnp.ndarray"):
    """Rewrite a [7,7,3,64] stride-2 stem kernel into the space-to-depth
    [4,4,12,64] stride-1 form (exact math; see ResNet50.stem_mode)."""
    import jax.numpy as jnp

    k = jnp.pad(conv7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # leading zero row/col
    kh, kw, cin, cout = k.shape  # 8, 8, 3, 64
    k = k.reshape(kh // 2, 2, kw // 2, 2, cin, cout)
    k = k.transpose(0, 2, 1, 3, 4, 5)  # [4, 4, dy, dx, c, out]
    return k.reshape(kh // 2, kw // 2, 4 * cin, cout)


class ResNet50(nn.Module):
    """Returns (C3, C4, C5); set ``num_outputs`` for other taps
    (reference re_layer, resnet50.py:33-40).

    ``stem_mode='s2d'`` replaces the 7x7/2 stem conv with the mathematically
    identical space-to-depth form (block-2 s2d then a 4x4/1 conv on 12
    channels, asymmetric (2,1) padding) — the canonical TPU ResNet stem: the
    MXU sees 12 input channels instead of 3 and a quarter of the positions.
    Pretrained 7x7 weights convert exactly via :func:`s2d_stem_kernel`.
    """

    num_outputs: int = 3
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    stage_widths: Tuple[int, ...] = (64, 128, 256, 512)
    stem_mode: str = "conv7"
    # gradient barrier after layer<k>: with stem+layer1..k frozen (reference
    # freeze_stages, resnet50.py:55-65, optimizer-masked in train/trainer.
    # param_labels), their backward pass is pure waste — stop_gradient at
    # the boundary removes it.  Identical gradients for every trainable
    # param; a no-op outside autodiff.
    grad_barrier_stages: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stem_mode == "s2d":
            x = space_to_depth(x, 2)
            x = nn.Conv(
                64, (4, 4), (1, 1), padding=[(2, 1), (2, 1)], use_bias=False,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                name="conv1_s2d",
            )(x)
        else:
            x = Conv(64, kernel=7, stride=2, use_bias=False, winit="resnet", name="conv1")(x)
        x = relu(BatchNorm(name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = []
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, self.stage_widths)):
            for block in range(blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = Bottleneck(width, stride, name=f"layer{stage + 1}_{block}")(x, train)
            if stage + 1 == self.grad_barrier_stages:
                x = jax.lax.stop_gradient(x)
            outputs.append(x)

        # outputs = [C2(/4, 256), C3(/8, 512), C4(/16, 1024), C5(/32, 2048)]
        return tuple(outputs[-self.num_outputs :])
