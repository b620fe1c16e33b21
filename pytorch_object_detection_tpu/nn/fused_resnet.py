"""Inference-fused ResNet-50 forward (Pallas conv3+BN+residual+ReLU).

A pure function over the standard `nn/resnet.ResNet50` variables pytree — no
separate weights, no retraining: frozen-BN scale/shift are folded at call
time and every bottleneck's 1x1 conv3 (and 1x1 conv1) runs through the
fused Pallas matmul epilogue (ops/pallas_fused.py), eliminating the
standalone residual-add+ReLU elementwise passes XLA schedules after each
block.  conv2 (3x3, strided) and the stem stay on XLA convs.

Numerics: bit-comparable to the linen forward up to f32 epilogue rounding
(the unfused path normalizes in bf16 when the caller casts; here the
epilogue is always f32) — equivalence tested.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

STAGE_SIZES = (3, 4, 6, 3)


def _fold_bn(p_bn, s_bn, eps: float = 1e-5):
    scale = p_bn["bn"]["scale"].astype(jnp.float32)
    bias = p_bn["bn"]["bias"].astype(jnp.float32)
    mean = s_bn["bn"]["mean"].astype(jnp.float32)
    var = s_bn["bn"]["var"].astype(jnp.float32)
    mult = scale * jax.lax.rsqrt(var + eps)
    return mult, bias - mean * mult


def _conv(x, kernel, stride=1, pad=None):
    k = kernel.shape[0]
    pad = pad if pad is not None else k // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_bn_act(x, kernel, mult, shift, stride=1, act=True):
    y = _conv(x, kernel, stride)
    y = y * mult.astype(y.dtype) + shift.astype(y.dtype)
    return jnp.maximum(y, 0.0) if act else y


def resnet50_fused_forward(variables, x, compute_dtype=jnp.bfloat16, interpret: bool = False):
    """(C3, C4, C5) from the standard ResNet50 variables, fused for eval."""
    from pytorch_object_detection_tpu.ops.pallas_fused import conv1x1_bn_act

    params = variables["params"]
    stats = variables["batch_stats"]

    def kern(scope, name="conv"):
        return params[scope][name]["kernel"].astype(compute_dtype)

    x = x.astype(compute_dtype)
    # stem (XLA conv; BN+ReLU fuse into its epilogue)
    mult, shift = _fold_bn(params["bn1"], stats["bn1"])
    x = _conv_bn_act(x, kern("conv1"), mult, shift, stride=2)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    outputs = []
    for stage, blocks in enumerate(STAGE_SIZES):
        for b in range(blocks):
            scope = f"layer{stage + 1}_{b}"
            p = params[scope]
            s = stats[scope]
            stride = 2 if (b == 0 and stage > 0) else 1

            m1, s1 = _fold_bn(p["bn1"], s["bn1"])
            m2, s2 = _fold_bn(p["bn2"], s["bn2"])
            m3, s3 = _fold_bn(p["bn3"], s["bn3"])

            # conv1 1x1: fused Pallas matmul + BN + ReLU
            y = conv1x1_bn_act(
                x, p["conv1"]["conv"]["kernel"].astype(compute_dtype), m1, s1,
                act=True, interpret=interpret,
            )
            # conv2 3x3 (possibly strided): XLA conv, BN+ReLU epilogue
            y = _conv_bn_act(y, p["conv2"]["conv"]["kernel"].astype(compute_dtype), m2, s2, stride)
            # shortcut
            if "downsample_conv" in p:
                md, sd = _fold_bn(p["downsample_bn"], s["downsample_bn"])
                shortcut = _conv_bn_act(
                    x, p["downsample_conv"]["conv"]["kernel"].astype(compute_dtype),
                    md, sd, stride, act=False,
                )
            else:
                shortcut = x
            # conv3 1x1 + BN + residual + ReLU: the fused epilogue
            x = conv1x1_bn_act(
                y, p["conv3"]["conv"]["kernel"].astype(compute_dtype), m3, s3,
                residual=shortcut, act=True, interpret=interpret,
            )
        outputs.append(x)

    return tuple(outputs[-3:])
