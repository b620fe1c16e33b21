"""int8 PTQ inference forward for the HisFPN pyramid.

Extends the backbone's serving dtype ladder (nn/resnet_int8.py) through the
FPN: every HisFPN BatchNorm is frozen at eval, so BN folds into conv weights
exactly as in the backbone, weights quantize per-out-channel int8, and
activations per-tensor int8 (abs-max calibration).  The HisBlock's two
concat inputs sit at different activation scales; their per-input-channel
scales are folded into the float kernel BEFORE weight quantization, so the
concat needs no common-scale compromise.

Epilogue forms (scale algebra precomputed by :func:`quantize_hisfpn`):
  * linear/ReLU requant:  q = clip(round(relu?(acc*A + B)))          (A,B/ch)
  * SiLU requant:         q = clip(round(silu(acc*A + B) * inv_s))   (scalar inv_s)

SE stays f32 (two 128x32 dots per image — noise), but its gate is applied
in the int8 domain: ``b_q = round(x1_q * sigmoid(...))`` (gate < 1 keeps
int8 range), so branch ``b`` needs no extra requant scale.

Level glue (upsample-add / maxpool-add) runs on int8 tensors: maxpool and
2x replication preserve the scale; cross-scale adds requantize to the
calibrated scale of the sum in one elementwise pass.

Counterpart of the reference's fp32 FPN eval
(`/root/reference/model/od/HISFcos.py:115-179`); the float semantics being
quantized are the BN-folded forward in nn/fused_fpn.py.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn
from pytorch_object_detection_tpu.ops.quant import INT8_MAX, act_scale, weight_qparams

BLOCKS = ("his1", "his2", "his3", "his4", "his5", "his6", "his7")


# ---------------------------------------------------------------- helpers


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _clip8(x):
    return jnp.clip(jnp.round(x), -INT8_MAX, INT8_MAX).astype(jnp.int8)


def _upsample2x_i8(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _maxpool2x2_i8(x):
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _add_requant(xa, sa, xb, sb, s_out):
    """int8 (sa) + int8 (sb) -> int8 at s_out, one elementwise pass."""
    y = xa.astype(jnp.float32) * (sa / s_out) + xb.astype(jnp.float32) * (sb / s_out)
    return _clip8(y)


def _conv_i8(x_q, w_q, pad, dilation=1, groups=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _requant(acc, a, b, relu=True):
    y = acc * a + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return _clip8(y)


def _folded_kb(p, s, conv_scope, bn_scope):
    """float (kernel, bias) for conv -> frozen-BN, f32."""
    mult, shift = _fold_bn(p[bn_scope], s[bn_scope])
    k = p[conv_scope]["conv"]["kernel"].astype(jnp.float32) * mult
    b = shift
    if "bias" in p[conv_scope]["conv"]:
        b = b + p[conv_scope]["conv"]["bias"].astype(jnp.float32) * mult
    return k, b


# ---------------------------------------------------------------- calibration


def _float_hisblock_taps(p, s, x, taps, prefix):
    """BN-folded float HisBlock forward (mirrors nn/fused_fpn._hisblock)
    recording abs-max at every future quantization point."""
    k1, b1 = _folded_kb(p, s, "conv1", "bn1")
    x1 = _silu(
        jax.lax.conv_general_dilated(
            x, k1, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1
    )
    taps[f"{prefix}.x1"] = jnp.max(jnp.abs(x1))
    k2 = p["conv2"]["conv"]["kernel"].astype(jnp.float32)
    b2 = p["conv2"]["conv"]["bias"].astype(jnp.float32)
    x2 = jax.lax.conv_general_dilated(
        x, k2, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b2
    taps[f"{prefix}.x2"] = jnp.max(jnp.abs(x2))

    m2, s2 = _fold_bn(p["bn2"], s["bn2"])
    dw_k = p["dwconv"]["dw"]["conv"]["kernel"].astype(jnp.float32) * m2
    a = jax.lax.conv_general_dilated(
        x1, dw_k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x1.shape[-1],
    ) + s2
    a = jnp.maximum(a, 0.0)
    taps[f"{prefix}.a"] = jnp.max(jnp.abs(a))

    se = p["se"]
    mean = jnp.mean(x1, axis=(1, 2), keepdims=True)
    g = jax.lax.conv_general_dilated(
        mean, se["fc1"]["conv"]["kernel"].astype(jnp.float32), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["fc1"]["conv"]["bias"].astype(jnp.float32)
    g = _silu(g)
    g = jax.lax.conv_general_dilated(
        g, se["fc2"]["conv"]["kernel"].astype(jnp.float32), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["fc2"]["conv"]["bias"].astype(jnp.float32)
    b = x1 * jax.nn.sigmoid(g)

    k3, b3 = _folded_kb(p, s, "conv3", "bn3")
    m = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], axis=-1), k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b3
    m = jnp.maximum(m, 0.0)
    taps[f"{prefix}.m"] = jnp.max(jnp.abs(m))

    k4, b4 = _folded_kb(p, s, "conv4", "bn4")
    y = jax.lax.conv_general_dilated(
        jnp.concatenate([m, x2], axis=-1), k4, (1, 1), [(2, 2), (2, 2)],
        rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b4
    y = _silu(y)
    taps[f"{prefix}.out"] = jnp.max(jnp.abs(y))
    return y


def calibrate_hisfpn(fpn_params, fpn_stats, feats) -> Dict[str, jnp.ndarray]:
    """Float (f32, BN-folded) HisFPN forward recording abs-max taps.

    feats: float (C3, C4, C5).  Returns {tap: scalar}; jit and reduce with
    jnp.maximum across calibration batches.
    """
    p, s = fpn_params, fpn_stats
    taps: Dict[str, jnp.ndarray] = {}
    c3, c4, c5 = [f.astype(jnp.float32) for f in feats]

    def lateral(c, conv_scope, bn_scope, tap):
        k, b = _folded_kb(p, s, conv_scope, bn_scope)
        t = jax.lax.conv_general_dilated(
            c, k, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        t = jnp.maximum(t, 0.0)
        taps[tap] = jnp.max(jnp.abs(t))
        return t

    t5 = lateral(c5, "tf1", "bn_tf1", "t5")
    seed6 = jax.lax.reduce_window(t5, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    seed7 = jax.lax.reduce_window(seed6, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    d5 = _float_hisblock_taps(p["his1"], s["his1"], t5, taps, "his1")
    t4 = lateral(c4, "tf2", "bn_lat_shared", "t4")
    up = jnp.repeat(jnp.repeat(d5, 2, 1), 2, 2)
    in2 = up + t4
    taps["in2"] = jnp.max(jnp.abs(in2))
    d4 = _float_hisblock_taps(p["his2"], s["his2"], in2, taps, "his2")
    t3 = lateral(c3, "tf3", "bn_lat_shared", "t3")
    in3 = jnp.repeat(jnp.repeat(d4, 2, 1), 2, 2) + t3
    taps["in3"] = jnp.max(jnp.abs(in3))
    p3 = _float_hisblock_taps(p["his3"], s["his3"], in3, taps, "his3")

    def pool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    in4 = pool(p3) + d4
    taps["in4"] = jnp.max(jnp.abs(in4))
    p4 = _float_hisblock_taps(p["his4"], s["his4"], in4, taps, "his4")
    in5 = pool(p4) + d5
    taps["in5"] = jnp.max(jnp.abs(in5))
    p5 = _float_hisblock_taps(p["his5"], s["his5"], in5, taps, "his5")
    in6 = pool(p5) + seed6
    taps["in6"] = jnp.max(jnp.abs(in6))
    p6 = _float_hisblock_taps(p["his6"], s["his6"], in6, taps, "his6")
    in7 = pool(p6) + seed7
    taps["in7"] = jnp.max(jnp.abs(in7))
    _float_hisblock_taps(p["his7"], s["his7"], in7, taps, "his7")
    return taps


# ---------------------------------------------------------------- quantization


def _quantize_hisblock(p, s, s_in, taps, prefix) -> Dict:
    """Precompute int8 weights + epilogue scale algebra for one HisBlock."""
    s_x1 = act_scale(taps[f"{prefix}.x1"])
    s_x2 = act_scale(taps[f"{prefix}.x2"])
    s_a = act_scale(taps[f"{prefix}.a"])
    s_m = act_scale(taps[f"{prefix}.m"])
    s_out = act_scale(taps[f"{prefix}.out"])
    blk: Dict = {}

    k1, c1 = _folded_kb(p, s, "conv1", "bn1")
    w1q, sw1 = weight_qparams(k1)
    blk["w1"], blk["A1"], blk["B1"] = w1q, s_in * sw1, c1  # silu form
    blk["inv_x1"] = 1.0 / s_x1

    k2 = p["conv2"]["conv"]["kernel"].astype(jnp.float32)
    c2 = p["conv2"]["conv"]["bias"].astype(jnp.float32)
    w2q, sw2 = weight_qparams(k2)
    blk["w2"], blk["A2"], blk["B2"] = w2q, s_in * sw2 / s_x2, c2 / s_x2

    m2, sh2 = _fold_bn(p["bn2"], s["bn2"])
    kdw = p["dwconv"]["dw"]["conv"]["kernel"].astype(jnp.float32) * m2  # [3,3,1,C]
    wdwq, swdw = weight_qparams(kdw)
    blk["wdw"], blk["Adw"], blk["Bdw"] = wdwq, s_x1 * swdw / s_a, sh2 / s_a

    se = p["se"]
    blk["se_w1"] = se["fc1"]["conv"]["kernel"].astype(jnp.float32).reshape(
        se["fc1"]["conv"]["kernel"].shape[-2:]
    )
    blk["se_b1"] = se["fc1"]["conv"]["bias"].astype(jnp.float32)
    blk["se_w2"] = se["fc2"]["conv"]["kernel"].astype(jnp.float32).reshape(
        se["fc2"]["conv"]["kernel"].shape[-2:]
    )
    blk["se_b2"] = se["fc2"]["conv"]["bias"].astype(jnp.float32)
    blk["se_premul"] = s_x1  # mean of x1_q * s_x1 = mean of x1

    half = k1.shape[-1]  # f//2
    k3, c3 = _folded_kb(p, s, "conv3", "bn3")
    k3 = k3.at[:, :, :half].multiply(s_a).at[:, :, half:].multiply(s_x1)
    w3q, sw3 = weight_qparams(k3)
    blk["w3"], blk["A3"], blk["B3"] = w3q, sw3 / s_m, c3 / s_m

    k4, c4 = _folded_kb(p, s, "conv4", "bn4")
    k4 = k4.at[:, :, :half].multiply(s_m).at[:, :, half:].multiply(s_x2)
    w4q, sw4 = weight_qparams(k4)
    blk["w4"], blk["A4"], blk["B4"] = w4q, sw4, c4  # silu form
    blk["inv_out"] = 1.0 / s_out
    blk["s_out"] = s_out
    return blk


def quantize_hisfpn(fpn_params, fpn_stats, taps, feat_scales) -> Dict:
    """Fold BN, quantize weights, pre-fold all scale algebra for the FPN.

    feat_scales: (s_c3, s_c4, s_c5) — int8 scales of the backbone outputs
    (``resnet50_int8_forward(..., dequant=False)``).  taps: batch-reduced
    dict from :func:`calibrate_hisfpn`.
    """
    p, s = fpn_params, fpn_stats
    s_c3, s_c4, s_c5 = [jnp.asarray(x, jnp.float32) for x in feat_scales]
    q: Dict = {}

    def lateral(conv_scope, bn_scope, s_c, tap):
        k, c = _folded_kb(p, s, conv_scope, bn_scope)
        s_t = act_scale(taps[tap])
        wq, sw = weight_qparams(k)
        return {"w": wq, "A": s_c * sw / s_t, "B": c / s_t, "s": s_t}

    q["tf1"] = lateral("tf1", "bn_tf1", s_c5, "t5")
    q["tf2"] = lateral("tf2", "bn_lat_shared", s_c4, "t4")
    q["tf3"] = lateral("tf3", "bn_lat_shared", s_c3, "t3")

    s_in = {
        "his1": q["tf1"]["s"],
        "his2": act_scale(taps["in2"]),
        "his3": act_scale(taps["in3"]),
        "his4": act_scale(taps["in4"]),
        "his5": act_scale(taps["in5"]),
        "his6": act_scale(taps["in6"]),
        "his7": act_scale(taps["in7"]),
    }
    for blk in BLOCKS:
        q[blk] = _quantize_hisblock(p[blk], s[blk], s_in[blk], taps, blk)
        q[blk]["s_in"] = s_in[blk]
    return q


# ---------------------------------------------------------------- forward


def _hisblock_i8_xla(blk, x_q):
    """Reference per-op int8 HisBlock (epilogue algebra identical to the
    Pallas kernel in ops/pallas_qhis.py — kept as the numerics oracle and
    CPU-testable path)."""
    acc1 = _conv_i8(x_q, blk["w1"], 0)
    x1 = _silu(acc1 * blk["A1"] + blk["B1"])
    x1q = _clip8(x1 * blk["inv_x1"])

    x2q = _requant(_conv_i8(x_q, blk["w2"], 0), blk["A2"], blk["B2"], relu=False)

    c = x1q.shape[-1]
    acc_a = _conv_i8(x1q, blk["wdw"], 1, groups=c)
    aq = _requant(acc_a, blk["Adw"], blk["Bdw"])

    mean = jnp.mean(x1q.astype(jnp.float32), axis=(1, 2)) * blk["se_premul"]  # [B,C]
    g = _silu(mean @ blk["se_w1"] + blk["se_b1"])
    g = jax.nn.sigmoid(g @ blk["se_w2"] + blk["se_b2"])  # [B,C]
    bq = _clip8(x1q.astype(jnp.float32) * g[:, None, None, :])

    cat = jnp.concatenate([aq, bq], axis=-1)
    mq = _requant(_conv_i8(cat, blk["w3"], 1), blk["A3"], blk["B3"])

    cat2 = jnp.concatenate([mq, x2q], axis=-1)
    acc4 = _conv_i8(cat2, blk["w4"], 2, dilation=2)
    y = _silu(acc4 * blk["A4"] + blk["B4"])
    return _clip8(y * blk["inv_out"])


def hisfpn_int8_forward(qtree, feats_q, compute_dtype=jnp.bfloat16,
                        backend: str = "xla", dequant: bool = True,
                        interpret: bool = False):
    """5 pyramid levels from int8 (C3, C4, C5).

    feats_q: int8 backbone outputs (scales already folded into the lateral
    epilogues by :func:`quantize_hisfpn`).  backend='xla' per-op reference;
    'pallas' runs each HisBlock as one fused kernel (ops/pallas_qhis).
    dequant=True returns ``compute_dtype`` levels; False returns
    (levels_q int8, scales) for an int8-consuming head.
    """
    pallas = backend == "pallas"
    if pallas:
        from pytorch_object_detection_tpu.ops.pallas_pool import qmaxpool2x2
        from pytorch_object_detection_tpu.ops.pallas_qhis import qhisblock as _blk_fn

        _pool = functools.partial(qmaxpool2x2, interpret=interpret)
    else:
        _pool = _maxpool2x2_i8

    from pytorch_object_detection_tpu.ops.pallas_qconv import qconv1x1

    c3q, c4q, c5q = feats_q

    def block(name, xa, sa, xb=None, sb=None, up=False):
        """Run block `name` on clip8(xa*sa/s_in + xb*sb/s_in) (xb None: xa
        already at s_in).  Pallas fuses the combine into the kernel."""
        blk = qtree[name]
        if xb is None:
            if pallas:
                return _blk_fn(blk, xa, interpret=interpret)
            return _hisblock_i8_xla(blk, xa)
        s_in = blk["s_in"]
        if pallas:
            return _blk_fn(blk, xa, xb_q=xb, combine="up_add" if up else "add",
                           ca=sa / s_in, cb=sb / s_in, interpret=interpret)
        xa = _upsample2x_i8(xa) if up else xa
        return _hisblock_i8_xla(blk, _add_requant(xa, sa, xb, sb, s_in))

    def lateral(c_q, lat):
        if pallas:
            return qconv1x1(c_q, lat["w"].reshape(lat["w"].shape[-2:]), lat["A"],
                            lat["B"], interpret=interpret)
        return _requant(_conv_i8(c_q, lat["w"], 0), lat["A"], lat["B"])

    t5 = lateral(c5q, qtree["tf1"])
    seed6 = _pool(t5)
    seed7 = _pool(seed6)
    s_t5 = qtree["tf1"]["s"]
    s_d5 = qtree["his1"]["s_out"]
    s_d4 = qtree["his2"]["s_out"]

    d5 = block("his1", t5, s_t5)
    t4 = lateral(c4q, qtree["tf2"])
    d4 = block("his2", d5, s_d5, t4, qtree["tf2"]["s"], up=True)
    t3 = lateral(c3q, qtree["tf3"])
    p3 = block("his3", d4, s_d4, t3, qtree["tf3"]["s"], up=True)

    p4 = block("his4", _pool(p3), qtree["his3"]["s_out"], d4, s_d4)
    p5 = block("his5", _pool(p4), qtree["his4"]["s_out"], d5, s_d5)
    p6 = block("his6", _pool(p5), qtree["his5"]["s_out"], seed6, s_t5)
    p7 = block("his7", _pool(p6), qtree["his6"]["s_out"], seed7, s_t5)

    levels_q = (p3, p4, p5, p6, p7)
    scales = tuple(qtree[b]["s_out"] for b in ("his3", "his4", "his5", "his6", "his7"))
    if not dequant:
        return levels_q, scales
    return tuple(
        (lq.astype(jnp.float32) * sc).astype(compute_dtype)
        for lq, sc in zip(levels_q, scales)
    )
