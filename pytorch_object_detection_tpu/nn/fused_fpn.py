"""BN-folded functional HisFPN eval forward.

Pure function over the standard `nn/fpn.HisFPN` variables: every frozen
BatchNorm is folded into the preceding conv's kernel (+ a bias term) at
call time, so XLA sees plain conv+bias+activation chains and fuses them —
the module path instead emits a separate scale/shift pass per BN
(`divide_multiply` fusions, ~2.6 ms/iter at B=64, trace-measured) because
BN parameters are runtime tensors XLA cannot simplify away.

Structure mirrors HisFPN / HisBlock / SEBlock exactly
(reference model/od/HISFcos.py:77-179); numerics equal to the module
forward up to dtype rounding (tested in tests/test_quant.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn


def _conv(x, kernel, bias=None, stride=1, dilation=1, groups=1):
    k = kernel.shape[0]
    pad = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _folded(p, s, conv_scope, bn_scope, dtype):
    """(kernel*mult, shift-adjusted bias) for conv -> frozen BN."""
    mult, shift = _fold_bn(p[bn_scope], s[bn_scope])
    k = p[conv_scope]["conv"]["kernel"].astype(jnp.float32) * mult
    b = shift
    if "bias" in p[conv_scope]["conv"]:
        b = b + p[conv_scope]["conv"]["bias"].astype(jnp.float32) * mult
    return k.astype(dtype), b


def _se(p, x, dtype):
    y = jnp.mean(x, axis=(1, 2), keepdims=True)
    y = _conv(y, p["fc1"]["conv"]["kernel"].astype(dtype), p["fc1"]["conv"]["bias"])
    y = _silu(y)
    y = _conv(y, p["fc2"]["conv"]["kernel"].astype(dtype), p["fc2"]["conv"]["bias"])
    return x * jax.nn.sigmoid(y)


def _hisblock(p, s, x, dtype):
    x1 = _conv(x, *_folded(p, s, "conv1", "bn1", dtype))
    x1 = _silu(x1)
    x2 = _conv(x, p["conv2"]["conv"]["kernel"].astype(dtype), p["conv2"]["conv"]["bias"])
    dw_k = p["dwconv"]["dw"]["conv"]["kernel"]
    # fold bn2 into the depthwise kernel (per-channel)
    from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn as fold

    m2, s2 = fold(p["bn2"], s["bn2"])
    a = _conv(x1, (dw_k.astype(jnp.float32) * m2).astype(dtype),
              s2, groups=x1.shape[-1])
    a = jnp.maximum(a, 0)
    b = _se(p["se"], x1, dtype)
    m = jnp.concatenate([a, b], axis=-1)
    m = _conv(m, *_folded(p, s, "conv3", "bn3", dtype))
    m = jnp.maximum(m, 0)
    y = jnp.concatenate([m, x2], axis=-1)
    y = _conv(y, *_folded(p, s, "conv4", "bn4", dtype), dilation=2)
    return _silu(y)


def _upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _maxpool2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def hisfpn_folded_forward(fpn_params, fpn_stats, feats, compute_dtype=jnp.bfloat16):
    """(p3..p7) from (C3, C4, C5) — BN-folded HisFPN inference."""
    p, s = fpn_params, fpn_stats
    dt = compute_dtype
    c3, c4, c5 = [f.astype(dt) for f in feats]

    t5 = _conv(c5, *_folded(p, s, "tf1", "bn_tf1", dt))
    t5 = jnp.maximum(t5, 0)
    seed6 = _maxpool2x2(t5)
    seed7 = _maxpool2x2(seed6)

    d5 = _hisblock(p["his1"], s["his1"], t5, dt)
    t4 = _conv(c4, *_folded(p, s, "tf2", "bn_lat_shared", dt))
    t4 = jnp.maximum(t4, 0)
    d4 = _hisblock(p["his2"], s["his2"], _upsample2x(d5) + t4, dt)
    t3 = _conv(c3, *_folded(p, s, "tf3", "bn_lat_shared", dt))
    t3 = jnp.maximum(t3, 0)
    p3 = _hisblock(p["his3"], s["his3"], _upsample2x(d4) + t3, dt)

    p4 = _hisblock(p["his4"], s["his4"], _maxpool2x2(p3) + d4, dt)
    p5 = _hisblock(p["his5"], s["his5"], _maxpool2x2(p4) + d5, dt)
    p6 = _hisblock(p["his6"], s["his6"], _maxpool2x2(p5) + seed6, dt)
    p7 = _hisblock(p["his7"], s["his7"], _maxpool2x2(p6) + seed7, dt)
    return p3, p4, p5, p6, p7
