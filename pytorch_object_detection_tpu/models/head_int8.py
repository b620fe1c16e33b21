"""int8 PTQ inference forward for the HISFCOS head (GN-aware).

Completes the serving dtype ladder (backbone nn/resnet_int8.py, FPN
nn/fpn_int8.py) through the head.  Unlike BN, GroupNorm cannot be folded
into conv weights — its statistics depend on the activation — so the int8
scheme here is:

  conv (int8 x int8 -> int32 MXU)
    -> f32 per-channel dequant (the conv's A-vector MUST be applied before
       GN stats: per-out-channel weight scales change group statistics)
    -> GN stats over the full (H, W, group) extent, normalize + gamma/beta
       + activation in f32
    -> requantize at a per-LEVEL calibrated scale (GN outputs are
       near-N(0,1)*gamma+beta, so abs-max calibration is stable).

Head weights are shared across pyramid levels (reference
model/od/HISFcos.py:182-229); activation scales are calibrated PER LEVEL
(the A/B epilogue vectors mix shared weight scales with per-level
activation scales).  ``cnt_pred``/``reg_pred`` read the same tower output,
so they are packed into one 5-channel conv.

The ScaleExp on the regression branch (exp(pred * s_i)) is applied by the
caller in XLA — it is per-level, tiny, and exact.

Layer map quantized here (reference HISFcos.py:189-229):
  pw1(1x1, f->2f) -> GN32+ReLU -> dw3x3 -> GN32+SiLU -> pw2(1x1, 2f->f)+bias
  -> +residual -> [cls: 3x3 -> GN32+ReLU -> cls_pred 3x3]
                  [reg: 3x3 -> GN32+ReLU -> {cnt_pred, reg_pred} 3x3]
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.ops.quant import INT8_MAX, act_scale, weight_qparams

GN_EPS = 1e-5
NUM_GROUPS = 32


def _clip8(x):
    return jnp.clip(jnp.round(x), -INT8_MAX, INT8_MAX).astype(jnp.int8)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_i8(x_q, w_q, pad=0, groups=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _gn(z, gamma, beta, act):
    """GroupNorm32 + activation on f32 NHWC (flax nn.GroupNorm semantics)."""
    b, h, w, c = z.shape
    g = z.reshape(b, h * w, NUM_GROUPS, c // NUM_GROUPS)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + GN_EPS)).reshape(b, h, w, c)
    y = y * gamma + beta
    if act == "relu":
        return jnp.maximum(y, 0.0)
    return _silu(y)


def _conv_f32(x, k, bias=None, pad=0, groups=1):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y if bias is None else y + bias


# ---------------------------------------------------------------- calibration


def calibrate_hishead(head_params, levels) -> Dict[str, jnp.ndarray]:
    """Float HISHead forward recording per-level abs-max at the requant
    points (x1 post-gn1, x2 post-gn2, y post-residual, c/r post tower GNs).
    """
    p = head_params
    taps: Dict[str, jnp.ndarray] = {}
    k = lambda scope: p[scope]["conv"]["kernel"].astype(jnp.float32)
    bias = lambda scope: p[scope]["conv"]["bias"].astype(jnp.float32)
    gn = lambda scope: (p[scope]["gn"]["scale"].astype(jnp.float32),
                        p[scope]["gn"]["bias"].astype(jnp.float32))

    for i, x in enumerate(levels):
        x = x.astype(jnp.float32)
        z = _conv_f32(x, k("stem_pw1"))
        x1 = _gn(z, *gn("stem_gn1"), act="relu")
        taps[f"L{i}.x1"] = jnp.max(jnp.abs(x1))
        z = _conv_f32(x1, p["stem_dw"]["dw"]["conv"]["kernel"].astype(jnp.float32),
                      pad=1, groups=x1.shape[-1])
        x2 = _gn(z, *gn("stem_gn2"), act="silu")
        taps[f"L{i}.x2"] = jnp.max(jnp.abs(x2))
        y = _conv_f32(x2, k("stem_pw2"), bias("stem_pw2")) + x
        taps[f"L{i}.y"] = jnp.max(jnp.abs(y))
        c = _gn(_conv_f32(y, k("cls_tower0"), pad=1), *gn("cls_gn0"), act="relu")
        taps[f"L{i}.c"] = jnp.max(jnp.abs(c))
        r = _gn(_conv_f32(y, k("reg_tower0"), pad=1), *gn("reg_gn0"), act="relu")
        taps[f"L{i}.r"] = jnp.max(jnp.abs(r))
    return taps


# ---------------------------------------------------------------- quantization


def quantize_hishead(head_params, taps, level_scales: Sequence, num_classes: int) -> Dict:
    """Quantize shared head weights once; build per-level epilogue vectors.

    level_scales: int8 scales of the 5 FPN levels
    (``hisfpn_int8_forward(..., dequant=False)``).
    """
    p = head_params
    q: Dict = {}

    w1q, sw1 = weight_qparams(p["stem_pw1"]["conv"]["kernel"].astype(jnp.float32))
    wdwq, swdw = weight_qparams(p["stem_dw"]["dw"]["conv"]["kernel"].astype(jnp.float32))
    w2q, sw2 = weight_qparams(p["stem_pw2"]["conv"]["kernel"].astype(jnp.float32))
    wcq, swc = weight_qparams(p["cls_tower0"]["conv"]["kernel"].astype(jnp.float32))
    wrq, swr = weight_qparams(p["reg_tower0"]["conv"]["kernel"].astype(jnp.float32))
    wpc, swpc = weight_qparams(p["cls_pred"]["conv"]["kernel"].astype(jnp.float32))
    kcr = jnp.concatenate([
        p["cnt_pred"]["conv"]["kernel"].astype(jnp.float32),
        p["reg_pred"]["conv"]["kernel"].astype(jnp.float32),
    ], axis=-1)  # [3,3,C,5]
    wcrq, swcr = weight_qparams(kcr)
    bcr = jnp.concatenate([
        p["cnt_pred"]["conv"]["bias"].astype(jnp.float32),
        p["reg_pred"]["conv"]["bias"].astype(jnp.float32),
    ])
    q.update(
        w1=w1q, wdw=wdwq, w2=w2q, wc=wcq, wr=wrq, wpc=wpc, wcr=wcrq,
        b2=p["stem_pw2"]["conv"]["bias"].astype(jnp.float32),
        bpc=p["cls_pred"]["conv"]["bias"].astype(jnp.float32), bcr=bcr,
        gn1=(p["stem_gn1"]["gn"]["scale"].astype(jnp.float32),
             p["stem_gn1"]["gn"]["bias"].astype(jnp.float32)),
        gn2=(p["stem_gn2"]["gn"]["scale"].astype(jnp.float32),
             p["stem_gn2"]["gn"]["bias"].astype(jnp.float32)),
        gnc=(p["cls_gn0"]["gn"]["scale"].astype(jnp.float32),
             p["cls_gn0"]["gn"]["bias"].astype(jnp.float32)),
        gnr=(p["reg_gn0"]["gn"]["scale"].astype(jnp.float32),
             p["reg_gn0"]["gn"]["bias"].astype(jnp.float32)),
        num_classes=num_classes,
        scale_exp=jnp.stack([
            p[f"scale{i}"]["scale"].astype(jnp.float32).reshape(())
            for i in range(len(level_scales))
        ]),
    )

    levels = []
    for i, s_lv in enumerate(level_scales):
        s_lv = jnp.asarray(s_lv, jnp.float32)
        s_x1 = act_scale(taps[f"L{i}.x1"])
        s_x2 = act_scale(taps[f"L{i}.x2"])
        s_y = act_scale(taps[f"L{i}.y"])
        s_c = act_scale(taps[f"L{i}.c"])
        s_r = act_scale(taps[f"L{i}.r"])
        levels.append(dict(
            A1=s_lv * sw1,              # pre-GN dequant (per out-channel)
            inv_x1=1.0 / s_x1,
            Adw=s_x1 * swdw,
            inv_x2=1.0 / s_x2,
            A2=s_x2 * sw2 / s_y, B2=q["b2"] / s_y, res_mul=s_lv / s_y,
            Ac=s_y * swc,
            inv_c=1.0 / s_c,
            Ar=s_y * swr,
            inv_r=1.0 / s_r,
            Apc=s_c * swpc, Acr=s_r * swcr,
        ))
    q["levels"] = levels
    return q


# ---------------------------------------------------------------- forward


def _hishead_level_i8_xla(q, lv, x_q, num_classes=None):
    """Per-op int8 oracle for one level (epilogue algebra identical to the
    Pallas kernel in ops/pallas_qhead.py).  num_classes unused (the pred
    weights already carry the channel count) — accepted for call symmetry
    with the Pallas path."""
    c = x_q.shape[-1]
    z = _conv_i8(x_q, q["w1"]) * lv["A1"]
    x1q = _clip8(_gn(z, *q["gn1"], act="relu") * lv["inv_x1"])
    z = _conv_i8(x1q, q["wdw"], pad=1, groups=2 * c) * lv["Adw"]
    x2q = _clip8(_gn(z, *q["gn2"], act="silu") * lv["inv_x2"])
    y = _conv_i8(x2q, q["w2"]) * lv["A2"] + lv["B2"] + x_q.astype(jnp.float32) * lv["res_mul"]
    yq = _clip8(y)
    zc = _conv_i8(yq, q["wc"], pad=1) * lv["Ac"]
    cq = _clip8(_gn(zc, *q["gnc"], act="relu") * lv["inv_c"])
    zr = _conv_i8(yq, q["wr"], pad=1) * lv["Ar"]
    rq = _clip8(_gn(zr, *q["gnr"], act="relu") * lv["inv_r"])
    cls = _conv_i8(cq, q["wpc"], pad=1) * lv["Apc"] + q["bpc"]
    cr = _conv_i8(rq, q["wcr"], pad=1) * lv["Acr"] + q["bcr"]
    return cls, cr


def hishead_int8_forward(q, levels_q, backend: str = "xla",
                         interpret: bool = False,
                         num_classes: int | None = None) -> Tuple[List, List, List]:
    """Per-level fp32 (cls, cnt, reg) from int8 pyramid levels.

    Output contract matches ``HISHead.apply`` (reg already exp-activated
    through the per-level ScaleExp).  ``num_classes`` must be passed as a
    static int when ``q`` flows through a jit boundary (dict leaves become
    tracers there).
    """
    import os

    nc = int(num_classes) if num_classes is not None else int(q["num_classes"])
    if backend == "pallas":
        from pytorch_object_detection_tpu.ops.pallas_qhead import (
            qhishead_level,
            qhishead_level2,
        )

        # r5 on-chip A/B (PERF.md "COCO head kernel round 3"): the
        # image-pair pipelined v2 kernel wins at COCO-canvas level sizes
        # (P3 14.25 -> 11.96 ms, e2e 413.9 -> 427.6 img/s) by hiding the
        # per-image VPU chain (depthwise/GN stats/normalize) under the
        # other image's MXU dots; at 512^2 levels the v1 single-image
        # kernel remains the measured-best.  Default "auto" picks per
        # level by that boundary; PODT_QHEAD_V2=0/1 forces v1/v2.
        # (v2 itself falls back to v1 for odd batches.)
        v2_env = os.environ.get("PODT_QHEAD_V2", "auto")

        def level_fn(q, lv, x_q, *, num_classes, interpret,
                     _env=v2_env):
            if _env == "1":
                use_v2 = True
            elif _env == "0":
                use_v2 = False
            else:  # auto: COCO-scale levels (> the 512^2 P3's 64x64 px)
                use_v2 = x_q.shape[1] * x_q.shape[2] > 64 * 64
            fn = qhishead_level2 if use_v2 else qhishead_level
            return fn(q, lv, x_q, num_classes=num_classes,
                      interpret=interpret)

    cls_l, cnt_l, reg_l = [], [], []
    for i, x_q in enumerate(levels_q):
        lv = q["levels"][i]
        if backend == "pallas":
            cls, cr = level_fn(q, lv, x_q, num_classes=nc, interpret=interpret)
        else:
            cls, cr = _hishead_level_i8_xla(q, lv, x_q, nc)
        s = q["scale_exp"][i]
        cls_l.append(cls.astype(jnp.float32))
        cnt_l.append(cr[..., :1].astype(jnp.float32))
        reg_l.append(jnp.exp(cr[..., 1:5].astype(jnp.float32) * s))
    return cls_l, cnt_l, reg_l
