"""Deformable convolution v2 (XLA gather implementation, NHWC).

TPU-native replacement for `torchvision.ops.deform_conv2d` as used by the
reference's `DeformableConv2d` (modules.py:219-277): an offset conv and a
modulator conv predict per-output-pixel sampling offsets / masks; the input
is bilinearly sampled at the offset taps and reduced with a regular conv
kernel.

Implementation: offsets produce ``kh*kw`` fractional taps per output pixel;
bilinear sampling is 4 gathers per tap batched over NHW (XLA lowers to
vectorized dynamic-gathers), then the tap dimension contracts against the
kernel on the MXU via dot_general.  Zero-init offsets/modulator make the
module equal a regular conv at init (the reference's init, modules.py:242-253).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_gather(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; y/x [..., T] fractional coords -> [..., T, C].

    Out-of-bounds taps contribute zero (torch deform_conv semantics).
    """
    h, w, _ = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]  # advanced indexing -> gather, [..., T, C]
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_sample(images: jnp.ndarray, offsets: jnp.ndarray, kernel: int, stride: int = 1):
    """images [B,H,W,C]; offsets [B,Ho,Wo,2*k*k] (dy,dx interleaved per tap)
    -> sampled taps [B,Ho,Wo,k*k,C]."""
    b, h, w, c = images.shape
    ho, wo = offsets.shape[1:3]
    k = kernel
    pad = k // 2
    base_y = jnp.arange(ho) * stride
    base_x = jnp.arange(wo) * stride
    ky, kx = jnp.meshgrid(jnp.arange(k) - pad, jnp.arange(k) - pad, indexing="ij")
    taps_y = base_y[:, None, None] + ky.reshape(-1)[None, None, :]  # [Ho,1,T]
    taps_x = base_x[None, :, None] + kx.reshape(-1)[None, None, :]  # [1,Wo,T]
    off = offsets.reshape(b, ho, wo, k * k, 2)
    y = taps_y[None].astype(jnp.float32) + off[..., 0]
    x = taps_x[None].astype(jnp.float32) + off[..., 1]
    return jax.vmap(_bilinear_gather)(images, y, x)  # [B,Ho,Wo,T,C]


class DeformableConv(nn.Module):
    """DCNv2: offset+modulator convs -> bilinear taps -> kernel contraction."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        t = k * k
        # zero-init offset conv: the module equals a regular conv at init
        offsets = nn.Conv(
            2 * t, (k, k), (self.stride, self.stride), padding=[(k // 2,) * 2] * 2,
            kernel_init=nn.initializers.zeros, name="offset_conv",
        )(x)
        modulator = 2.0 * jax.nn.sigmoid(
            nn.Conv(
                t, (k, k), (self.stride, self.stride), padding=[(k // 2,) * 2] * 2,
                kernel_init=nn.initializers.zeros, name="modulator_conv",
            )(x)
        )
        taps = deform_sample(x, offsets, k, self.stride)  # [B,Ho,Wo,T,C]
        taps = taps * modulator[..., None]
        kernel_w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (t, x.shape[-1], self.features),
        )
        out = jax.lax.dot_general(
            taps, kernel_w, (((3, 4), (0, 1)), ((), ())), preferred_element_type=jnp.float32
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out
