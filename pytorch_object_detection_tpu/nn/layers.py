"""Shared NN primitives (flax.linen, NHWC, bf16-friendly).

Re-designs the building blocks of `/root/reference/model/modules/modules.py`
as functional linen modules.  Layout is NHWC throughout (TPU-native: XLA
lowers NHWC convs straight onto the MXU without transposes); norms/activations
fuse into the surrounding convs via XLA.

Parity notes vs the reference:
  * `MNBlock` here uses true same-padding ``d*(k-1)//2`` for its dilated
    depthwise conv.  The reference (modules.py:203) passes ``padding=dilated``
    which shrinks the map for (k=5,d=2), (k=5,d=1), (k=7,d=1) and crashes the
    residual add — a latent bug; we implement the evident intent.
  * `ConvBnAct` honours its ``mode`` argument.  The reference always
    overwrites the conv with a depthwise conv (modules.py:16-24); that quirk
    only affects the RetinaNet scaffold and is not replicated.
  * weight init mirrors torch semantics: default conv init is
    kaiming-uniform(a=sqrt(5)) with uniform bias, detection heads use
    normal(0.01) (modules.py:179-184), FPNs kaiming-uniform(a=1)
    (modules.py:187-192).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# initializers (torch-semantics)
# ---------------------------------------------------------------------------
def kaiming_uniform(a: float) -> Callable:
    """torch ``kaiming_uniform_`` over flax conv kernels ``(kh, kw, cin/g, cout)``."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(shape[0]) * int(shape[1]) * int(shape[2]) if len(shape) == 4 else int(shape[0])
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


TORCH_CONV_KERNEL_INIT = kaiming_uniform(math.sqrt(5.0))
HEAD_NORMAL_INIT = nn.initializers.normal(stddev=0.01)
FPN_KAIMING_INIT = kaiming_uniform(1.0)


# ---------------------------------------------------------------------------
# conv / norm wrappers
# ---------------------------------------------------------------------------
class Conv(nn.Module):
    """2D conv with torch-compatible padding arithmetic and init.

    ``winit``: 'torch' (default torch Conv2d), 'head' (normal 0.01, zero
    bias), 'fpn' (kaiming uniform a=1, zero bias), 'resnet' (kaiming normal
    fan-out).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    # NOTE: named `winit`, not `init` — a field called `init` would shadow
    # linen Module.init and break direct `Conv(...).init(...)` calls
    winit: str = "torch"
    bias_const: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel, self.dilation
        pad = d * (k - 1) // 2
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        if self.winit == "head":
            kernel_init, bias_init = HEAD_NORMAL_INIT, nn.initializers.zeros
        elif self.winit == "fpn":
            kernel_init, bias_init = FPN_KAIMING_INIT, nn.initializers.zeros
        elif self.winit == "resnet":
            kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
            bias_init = nn.initializers.zeros
        else:
            kernel_init, bias_init = TORCH_CONV_KERNEL_INIT, torch_bias_uniform(fan_in)
        if self.bias_const is not None:
            bias_init = nn.initializers.constant(self.bias_const)
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(d, d),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            name="conv",
        )(x)


class DepthwiseConv(nn.Module):
    """Per-channel conv (groups == channels), reference modules.py:40-49."""

    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    # NOTE: named `winit`, not `init` — a field called `init` would shadow
    # linen Module.init and break direct `Conv(...).init(...)` calls
    winit: str = "torch"

    @nn.compact
    def __call__(self, x):
        return Conv(
            x.shape[-1],
            self.kernel,
            self.stride,
            self.dilation,
            groups=x.shape[-1],
            use_bias=self.use_bias,
            winit=self.winit,
            name="dw",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with explicit train/frozen control.

    The reference freezes every BatchNorm during training (eval mode +
    requires_grad=False — HISFcos.py:57-68, Fcos.py:41-49, MNFcos.py:21-30),
    so the default here is ``use_running_average=True`` unless the caller
    passes ``train=True`` *and* the surrounding model un-freezes BN.  The
    trainer additionally masks BN params out of the optimizer when frozen.
    Module name is always 'bn*' so optimizer masks can target it by path.
    """

    momentum: float = 0.9  # torch momentum 0.1 == flax momentum 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)


_PALLAS_GN = [False]


class pallas_gn:
    """Context manager: trace GroupNorm32 through the fused Pallas kernel
    (ops/pallas_gn — one HBM read+write, activation folded).  Inference
    only: the kernel defines no VJP. Enabled by the int8 eval pipeline."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        self.prev = _PALLAS_GN[0]
        _PALLAS_GN[0] = self.enabled
        return self

    def __exit__(self, *exc):
        _PALLAS_GN[0] = self.prev
        return False


class _PallasGN(nn.Module):
    """Param-compatible with nn.GroupNorm (scope 'gn': scale/bias [C])."""

    act: str = "none"

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        from pytorch_object_detection_tpu.ops.pallas_gn import groupnorm_act

        return groupnorm_act(x, scale, bias, groups=32, eps=1e-5, act=self.act)


class _MatmulGN(nn.Module):
    """GroupNorm whose statistics ride the MXU.

    XLA schedules the usual GN stats as a VPU reduction running at ~84 GB/s
    over the head's P3 tensors (trace-measured); one Gram matmul of
    [x | 1] against itself streams the same data at full HBM bandwidth and
    yields per-channel sums (last row) and sums of squares (diagonal) as a
    side effect of ~30 GFLOP of free MXU time.  Identical math to
    nn.GroupNorm(32, eps=1e-5): f32 stats, biased variance; same param
    scope/shape (scale/bias [C]).  Fully differentiable (it is just dots).
    """

    act: str = "none"
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        b = x.shape[0]
        cg = ch // self.groups
        x2 = x.reshape(b, -1, ch)
        n_pos = x2.shape[1]
        ones = jnp.ones((b, n_pos, 1), x.dtype)
        aug = jnp.concatenate([x2, ones], axis=-1)  # [B, N, C+1]
        gram = jax.lax.dot_general(
            aug, aug, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, C+1, C+1]
        sums = gram[:, ch, :ch]  # [B, C]
        sumsq = jnp.diagonal(gram, axis1=1, axis2=2)[:, :ch]
        gsum = sums.reshape(b, self.groups, cg).sum(-1)
        gsq = sumsq.reshape(b, self.groups, cg).sum(-1)
        n = n_pos * cg
        mean = gsum / n
        var = gsq / n - mean * mean
        inv = jax.lax.rsqrt(var + self.eps)  # [B, G]
        mul = jnp.repeat(inv, cg, axis=1) * scale[None, :]
        add = bias[None, :] - jnp.repeat(mean * inv, cg, axis=1) * scale[None, :]
        y = x * mul[:, None, None, :].astype(x.dtype) + add[:, None, None, :].astype(x.dtype)
        if self.act == "relu":
            y = relu(y)
        elif self.act == "silu":
            y = silu(y)
        return y


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups (the reference's head/tower norm).

    ``act`` folds the following activation ('relu'/'silu') into the norm —
    free for XLA (it fuses anyway) and required for the fused kernels to
    keep everything in one pass.
    """

    act: str = "none"

    @nn.compact
    def __call__(self, x):
        import os

        if _PALLAS_GN[0]:
            return _PallasGN(act=self.act, name="gn")(x)
        if os.environ.get("PODT_MATMUL_GN"):
            # measured NET NEGATIVE e2e (1200 vs 1503 img/s): the ones-concat
            # materializes a copy of x and the batched Gram schedules poorly;
            # kept opt-in for re-evaluation (PERF.md)
            return _MatmulGN(act=self.act, name="gn")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)
        if self.act == "relu":
            y = relu(y)
        elif self.act == "silu":
            y = silu(y)
        return y


# ---------------------------------------------------------------------------
# functional helpers
# ---------------------------------------------------------------------------
def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (reference nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def maxpool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool, floor mode (reference nn.MaxPool2d(2, 2))."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def silu(x):
    return jax.nn.silu(x)


def relu(x):
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------
class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference modules.py:107-121): GAP -> 1x1/r ->
    SiLU -> 1x1 -> sigmoid -> scale."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv(c // self.reduction, kernel=1, name="fc1")(y)
        y = silu(y)
        y = Conv(c, kernel=1, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class ScaleExp(nn.Module):
    """Learnable per-level regression scale: ``exp(x * s)``
    (reference modules.py:170-176)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", lambda _k: jnp.array([self.init_value], jnp.float32))
        return jnp.exp(x * s)


class ConvBnAct(nn.Module):
    """conv -> BN -> ReLU/SiLU (reference modules.py:6-37, with the
    always-depthwise quirk fixed; ``mode='DWconv'`` selects depthwise)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    act: str = "relu"
    mode: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode == "DWconv":
            x = DepthwiseConv(self.kernel, self.stride, self.dilation)(x)
        else:
            x = Conv(self.features, self.kernel, self.stride, self.dilation, use_bias=False)(x)
        x = BatchNorm(name="bn1")(x, train)
        return silu(x) if self.act == "SiLU" else relu(x)


class SeparableConv(nn.Module):
    """DW+BN+ReLU -> PW+BN+ReLU (reference modules.py:87-104)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(x.shape[-1], self.kernel, groups=x.shape[-1], name="dw")(x)
        x = relu(BatchNorm(name="bn1")(x, train))
        x = Conv(self.features, kernel=1, name="pw")(x)
        return relu(BatchNorm(name="bn2")(x, train))


class HisBlock(nn.Module):
    """Half-inverted-stage block (reference HISFcos.py:77-112).

    Half split: x1 = 1x1->BN->SiLU; branch a = DW3x3->BN->ReLU, branch b =
    SE(x1); concat -> 3x3->BN->ReLU; concat with passthrough 1x1(x) -> dilated
    3x3 -> BN -> SiLU.
    """

    features: int
    se_reduction: int = 4
    dilation: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        x1 = Conv(f // 2, kernel=1, name="conv1")(x)
        x1 = silu(BatchNorm(name="bn1")(x1, train))
        x2 = Conv(f // 2, kernel=1, name="conv2")(x)  # passthrough (no norm/act)
        a = DepthwiseConv(3, name="dwconv")(x1)
        a = relu(BatchNorm(name="bn2")(a, train))
        b = SEBlock(self.se_reduction, name="se")(x1)
        m = jnp.concatenate([a, b], axis=-1)
        m = Conv(f // 2, kernel=3, use_bias=False, name="conv3")(m)
        m = relu(BatchNorm(name="bn3")(m, train))
        y = jnp.concatenate([m, x2], axis=-1)
        y = Conv(f, kernel=3, dilation=self.dilation, use_bias=False, name="conv4")(y)
        return silu(BatchNorm(name="bn4")(y, train))


class MNBlock(nn.Module):
    """Dilated-DW -> BN -> PW-up -> SiLU -> PW-down + residual
    (reference modules.py:195-216, with same-padding fixed — see module doc).
    """

    features: int
    kernel: int = 3
    dilation: int = 1
    alpha: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DepthwiseConv(self.kernel, dilation=self.dilation, name="ddw")(x)
        y = BatchNorm(name="bn1")(y, train)
        y = Conv(x.shape[-1] * self.alpha, kernel=1, name="pw1")(y)
        y = silu(y)
        y = Conv(self.features, kernel=1, name="pw2")(y)
        return x + y


class MCBottle(nn.Module):
    """Inverted bottleneck PW-up(beta) -> DW -> SE -> PW-down + residual
    (reference modules.py:124-144)."""

    features: int
    kernel: int = 3
    beta: int = 4
    alpha: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = Conv(c * self.beta, kernel=1, use_bias=False, name="pw1")(x)
        y = silu(BatchNorm(name="bn1")(y, train))
        y = DepthwiseConv(self.kernel, name="dw")(y)
        y = silu(BatchNorm(name="bn2")(y, train))
        y = SEBlock(self.alpha, name="se")(y)
        y = Conv(self.features, kernel=1, use_bias=False, name="pw2")(y)
        y = silu(BatchNorm(name="bn3")(y, train))
        return x + y


class ICSPBlock(nn.Module):
    """CSP-style split over two MCBottles (reference modules.py:147-167)."""

    features: int
    kernel: int = 3
    beta: int = 2
    alpha: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = MCBottle(c, self.kernel, self.beta, self.alpha, name="bottle1")(x, train)
        y = MCBottle(c, self.kernel, self.beta, self.alpha, name="bottle2")(y, train)
        a = Conv(c // 2, kernel=1, name="pw3")(y)
        b = Conv(c // 2, kernel=1, name="pw4")(x)
        z = jnp.concatenate([a, b], axis=-1)
        z = relu(BatchNorm(name="bn3")(z, train))
        z = Conv(self.features, kernel=3, use_bias=False, name="conv5")(z)
        return relu(BatchNorm(name="bn4")(z, train))
