"""int8 PTQ serving ladder for the classic FCOS (FPN + 4-conv GN towers).

Generalizes the HISFCOS int8 path (nn/fpn_int8.py + models/head_int8.py)
to the baseline FCOS detector: the classic top-down FPN (1x1 laterals,
3x3 smoothing, stride-2 P6/P7 — reference model/od/Fcos.py:61-91) and the
shared 4x(conv3x3 -> GN32+ReLU) cls/reg towers with 3x3 pred convs
(reference model/od/Fcos.py:93-133).

Same scheme as the HISFCOS ladder:
  * weights per-out-channel int8, activations per-tensor abs-max
    calibrated at every requant point (FPN convs have no norm, so the
    conv bias rides the f32 epilogue; GN in the head cannot fold — stats
    run in f32 on the dequantized accumulator, models/head_int8._gn);
  * upsample2x is nearest (exact on int8); the top-down adds run as one
    f32 elementwise pass fused by XLA into the consuming conv;
  * head weights are shared across levels, activation scales are PER
    LEVEL; cnt/reg preds pack into one 5-channel conv; ScaleExp applies
    in the caller's f32 epilogue.

The tower/pred convs are plain dense 3x3 int8 convs — XLA's int8 MXU
path handles them well (the HisBlock-style fused kernels exist for the
shapes that need them; FCOS is the capability row, HISFCOS the perf
row).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.head_int8 import _clip8, _conv_f32, _gn
from pytorch_object_detection_tpu.ops.quant import act_scale, weight_qparams

NUM_TOWER = 4


def _conv_i8(x_q, w_q, pad=0, stride=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _kb(p, scope):
    conv = p[scope]["conv"]
    k = conv["kernel"].astype(jnp.float32)
    b = conv["bias"].astype(jnp.float32) if "bias" in conv else jnp.zeros(
        (k.shape[-1],), jnp.float32)
    return k, b


def _conv_f(x, p, scope, pad=0, stride=1):
    k, b = _kb(p, scope)
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


# ------------------------------------------------------------- classic FPN


def calibrate_fpn_classic(fpn_params, feats) -> Dict[str, jnp.ndarray]:
    """Float classic-FPN forward recording abs-max at every requant point."""
    p = fpn_params
    c3, c4, c5 = [f.astype(jnp.float32) for f in feats]
    taps: Dict[str, jnp.ndarray] = {}

    t5 = _conv_f(c5, p, "lateral5")
    taps["t5"] = jnp.max(jnp.abs(t5))
    m4 = _up2(t5) + _conv_f(c4, p, "lateral4")
    taps["m4"] = jnp.max(jnp.abs(m4))
    p4 = _conv_f(m4, p, "smooth4", pad=1)
    taps["p4"] = jnp.max(jnp.abs(p4))
    m3 = _up2(p4) + _conv_f(c3, p, "lateral3")
    taps["m3"] = jnp.max(jnp.abs(m3))
    p3 = _conv_f(m3, p, "smooth3", pad=1)
    taps["p3"] = jnp.max(jnp.abs(p3))
    p5 = _conv_f(t5, p, "smooth5", pad=1)
    taps["p5"] = jnp.max(jnp.abs(p5))
    p6 = _conv_f(p5, p, "down6", pad=1, stride=2)
    taps["p6"] = jnp.max(jnp.abs(p6))
    p7 = _conv_f(jnp.maximum(p6, 0.0), p, "down7", pad=1, stride=2)
    taps["p7"] = jnp.max(jnp.abs(p7))
    return taps


def quantize_fpn_classic(fpn_params, taps, feat_scales: Sequence) -> Dict:
    """Quantize FPN weights + pre-fold the epilogue scale algebra.

    feat_scales: int8 scales of (C3, C4, C5) from
    ``resnet50_int8_forward(..., dequant=False)``.
    """
    p = fpn_params
    s3, s4, s5 = [jnp.asarray(s, jnp.float32) for s in feat_scales]
    s = {k: act_scale(v) for k, v in taps.items()}
    q: Dict = {"scales": {k: jnp.asarray(v, jnp.float32) for k, v in s.items()}}

    def conv(scope, s_in, s_out):
        k, b = _kb(p, scope)
        wq, sw = weight_qparams(k)
        return dict(w=wq, A=s_in * sw / s_out, B=b / s_out)

    # NOTE the "m4"/"m3" sum tensors: conv epilogues requant to the SUM
    # scale; the upsampled partner re-scales by s_prev/s_sum in the same
    # fused elementwise pass.
    q["lateral5"] = conv("lateral5", s5, s["t5"])
    q["lateral4"] = conv("lateral4", s4, s["m4"])
    q["lateral3"] = conv("lateral3", s3, s["m3"])
    q["smooth4"] = conv("smooth4", s["m4"], s["p4"])
    q["smooth3"] = conv("smooth3", s["m3"], s["p3"])
    q["smooth5"] = conv("smooth5", s["t5"], s["p5"])
    q["down6"] = conv("down6", s["p5"], s["p6"])
    q["down7"] = conv("down7", s["p6"], s["p7"])
    q["t5_to_m4"] = s["t5"] / s["m4"]
    q["p4_to_m3"] = s["p4"] / s["m3"]
    return q


def fpn_classic_int8_forward(qtree, feats_q, compute_dtype=jnp.bfloat16,
                             dequant: bool = True):
    """(C3, C4, C5) int8 -> five int8 pyramid levels (or dequantized).

    Returns ``[p3..p7]`` in ``compute_dtype`` when ``dequant`` else
    ``([p3..p7] int8, [s3..s7] f32 scales)``.
    """
    c3, c4, c5 = feats_q

    def rq(x_q, blk, pad=0, stride=1, partner=None, p_mul=None, relu_in=False):
        if relu_in:
            x_q = jnp.maximum(x_q, 0)
        acc = _conv_i8(x_q, blk["w"], pad=pad, stride=stride)
        y = acc * blk["A"] + blk["B"]
        if partner is not None:
            y = y + partner.astype(jnp.float32) * p_mul
        return _clip8(y)

    t5 = rq(c5, qtree["lateral5"])
    m4 = rq(c4, qtree["lateral4"], partner=_up2(t5), p_mul=qtree["t5_to_m4"])
    p4 = rq(m4, qtree["smooth4"], pad=1)
    m3 = rq(c3, qtree["lateral3"], partner=_up2(p4), p_mul=qtree["p4_to_m3"])
    p3 = rq(m3, qtree["smooth3"], pad=1)
    p5 = rq(t5, qtree["smooth5"], pad=1)
    p6 = rq(p5, qtree["down6"], pad=1, stride=2)
    p7 = rq(p6, qtree["down7"], pad=1, stride=2, relu_in=True)

    levels = [p3, p4, p5, p6, p7]
    s = qtree["scales"]
    scales = [s["p3"], s["p4"], s["p5"], s["p6"], s["p7"]]
    if not dequant:
        return levels, scales
    return [l.astype(jnp.float32).astype(compute_dtype) * sc.astype(compute_dtype)
            for l, sc in zip(levels, scales)]


# ------------------------------------------------------------- FCOS head


def calibrate_fcoshead(head_params, levels) -> Dict[str, jnp.ndarray]:
    """Float FCOSHead forward recording per-level abs-max after every
    tower GN+ReLU (4 cls + 4 reg requant points per level)."""
    p = head_params
    taps: Dict[str, jnp.ndarray] = {}
    gn = lambda scope: (p[scope]["gn"]["scale"].astype(jnp.float32),
                        p[scope]["gn"]["bias"].astype(jnp.float32))
    for i, x in enumerate(levels):
        c = x.astype(jnp.float32)
        r = x.astype(jnp.float32)
        for j in range(NUM_TOWER):
            kc = p[f"cls_tower{j}"]["conv"]["kernel"].astype(jnp.float32)
            c = _gn(_conv_f32(c, kc, pad=1), *gn(f"cls_gn{j}"), act="relu")
            taps[f"L{i}.c{j}"] = jnp.max(jnp.abs(c))
            kr = p[f"reg_tower{j}"]["conv"]["kernel"].astype(jnp.float32)
            r = _gn(_conv_f32(r, kr, pad=1), *gn(f"reg_gn{j}"), act="relu")
            taps[f"L{i}.r{j}"] = jnp.max(jnp.abs(r))
    return taps


def quantize_fcoshead(head_params, taps, level_scales: Sequence,
                      num_classes: int) -> Dict:
    """Shared tower/pred weights quantized once; per-level epilogues."""
    p = head_params
    q: Dict = {"num_classes": num_classes}
    swc, swr = [], []
    for j in range(NUM_TOWER):
        wq, sw = weight_qparams(p[f"cls_tower{j}"]["conv"]["kernel"].astype(jnp.float32))
        q[f"wc{j}"] = wq
        swc.append(sw)
        wq, sw = weight_qparams(p[f"reg_tower{j}"]["conv"]["kernel"].astype(jnp.float32))
        q[f"wr{j}"] = wq
        swr.append(sw)
        q[f"gnc{j}"] = (p[f"cls_gn{j}"]["gn"]["scale"].astype(jnp.float32),
                        p[f"cls_gn{j}"]["gn"]["bias"].astype(jnp.float32))
        q[f"gnr{j}"] = (p[f"reg_gn{j}"]["gn"]["scale"].astype(jnp.float32),
                        p[f"reg_gn{j}"]["gn"]["bias"].astype(jnp.float32))
    wpc, swpc = weight_qparams(p["cls_pred"]["conv"]["kernel"].astype(jnp.float32))
    kcr = jnp.concatenate([
        p["cnt_pred"]["conv"]["kernel"].astype(jnp.float32),
        p["reg_pred"]["conv"]["kernel"].astype(jnp.float32),
    ], axis=-1)
    wcr, swcr = weight_qparams(kcr)
    q.update(
        wpc=wpc, wcr=wcr,
        bpc=p["cls_pred"]["conv"]["bias"].astype(jnp.float32),
        bcr=jnp.concatenate([
            p["cnt_pred"]["conv"]["bias"].astype(jnp.float32),
            p["reg_pred"]["conv"]["bias"].astype(jnp.float32),
        ]),
        scale_exp=jnp.stack([
            p[f"scale{i}"]["scale"].astype(jnp.float32).reshape(())
            for i in range(len(level_scales))
        ]),
    )
    levels = []
    for i, s_lv in enumerate(level_scales):
        s_prev_c = s_prev_r = jnp.asarray(s_lv, jnp.float32)
        lv: Dict = {}
        for j in range(NUM_TOWER):
            s_c = act_scale(taps[f"L{i}.c{j}"])
            s_r = act_scale(taps[f"L{i}.r{j}"])
            lv[f"Ac{j}"] = s_prev_c * swc[j]
            lv[f"inv_c{j}"] = 1.0 / s_c
            lv[f"Ar{j}"] = s_prev_r * swr[j]
            lv[f"inv_r{j}"] = 1.0 / s_r
            s_prev_c, s_prev_r = s_c, s_r
        lv["Apc"] = s_prev_c * swpc
        lv["Acr"] = s_prev_r * swcr
        levels.append(lv)
    q["levels"] = levels
    return q


def fcoshead_int8_forward(q, levels_q, num_classes: int | None = None
                          ) -> Tuple[List, List, List]:
    """Per-level fp32 (cls, cnt, reg); contract matches FCOSHead.apply
    (reg exp-activated through the per-level ScaleExp)."""
    cls_l, cnt_l, reg_l = [], [], []
    for i, x_q in enumerate(levels_q):
        lv = q["levels"][i]
        c = r = x_q
        for j in range(NUM_TOWER):
            zc = _conv_i8(c, q[f"wc{j}"], pad=1) * lv[f"Ac{j}"]
            c = _clip8(_gn(zc, *q[f"gnc{j}"], act="relu") * lv[f"inv_c{j}"])
            zr = _conv_i8(r, q[f"wr{j}"], pad=1) * lv[f"Ar{j}"]
            r = _clip8(_gn(zr, *q[f"gnr{j}"], act="relu") * lv[f"inv_r{j}"])
        cls = _conv_i8(c, q["wpc"], pad=1) * lv["Apc"] + q["bpc"]
        cr = _conv_i8(r, q["wcr"], pad=1) * lv["Acr"] + q["bcr"]
        s = q["scale_exp"][i]
        cls_l.append(cls.astype(jnp.float32))
        cnt_l.append(cr[..., :1].astype(jnp.float32))
        reg_l.append(jnp.exp(cr[..., 1:5].astype(jnp.float32) * s))
    return cls_l, cnt_l, reg_l
