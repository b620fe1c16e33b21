"""Post-training int8 quantization primitives (TPU MXU path).

Scheme: symmetric int8 — per-out-channel scales for conv weights, per-tensor
abs-max scales for activations.  Convs run int8 x int8 -> int32 on the MXU
(v5e doubles int8 throughput vs bf16); dequant + bias + ReLU + requant fold
into the conv epilogue as one elementwise fusion, so inter-layer tensors hit
HBM as int8 (quarter the bytes of f32, half of bf16).

This replaces the reference's FP16 autocast inference story
(`/root/reference/test.py:198-223` runs fp32) with the TPU-idiomatic
inference dtype ladder: bf16 for training, int8 PTQ for serving.
"""
from __future__ import annotations

import jax.numpy as jnp

INT8_MAX = 127.0


def weight_qparams(w, axis=-1, eps: float = 1e-12):
    """Per-out-channel symmetric int8 quantization of a conv kernel.

    w: [kh, kw, cin, cout] (HWIO).  Returns (w_q int8, scale f32[cout]).
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (w.ndim + axis) % w.ndim)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(absmax, eps) / INT8_MAX
    w_q = jnp.clip(jnp.round(w / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale


def act_scale(absmax, eps: float = 1e-12):
    """Per-tensor activation scale from a calibrated abs-max."""
    return jnp.maximum(jnp.asarray(absmax, jnp.float32), eps) / INT8_MAX


def quantize_act(x, scale):
    """f32/bf16 -> int8 with the given per-tensor scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def requantize(acc_f32, inv_out_scale_mul, shift, relu: bool = True):
    """Fused epilogue: f32 pre-activation -> int8 at the next layer's scale.

    acc_f32 * mul + shift is the pre-activation already divided by the output
    scale (callers fold 1/s_out into ``inv_out_scale_mul``/``shift``).
    """
    y = acc_f32 * inv_out_scale_mul + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -INT8_MAX, INT8_MAX).astype(jnp.int8)
