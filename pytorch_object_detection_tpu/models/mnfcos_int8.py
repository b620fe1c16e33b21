"""int8 PTQ serving ladder for MNFCOS (lightweight MNBlock FPN + MN head).

Completes the int8 coverage of the model zoo's live trainers (HISFCOS:
nn/fpn_int8 + models/head_int8; classic FCOS: models/fcos_int8;
EfficientNet-B0 backbone: nn/efficientnet_int8): the MNFCOS pyramid
(reference `/root/reference/model/od/MNFcos.py:222-256`) and head
(`MNFcos.py:259-297`), whose building block is the dilated-depthwise
MNBlock (`/root/reference/model/modules/modules.py:195-216`).

Same PTQ scheme as the sibling ladders:
  * weights per-out-channel int8, activations per-tensor abs-max at every
    requant point; the MNBlock's BN folds into the depthwise conv exactly
    (per-channel == per-out-channel for groups=C);
  * SiLU runs in the f32 conv epilogue before the requant (symmetric int8
    carries the negative tail);
  * the residual add requants to the block-output scale with the input
    riding the same fused elementwise pass (x_q * s_in/s_out);
  * upsample2x (nearest) and 2x2 maxpool are exact on int8;
  * head MNBlocks/towers share weights across levels with PER-LEVEL
    activation scales; cnt/reg preds pack into one 5-channel conv and
    ScaleExp applies in the f32 epilogue.

XLA int8 convs throughout (capability row — the fused-kernel treatment is
reserved for the HISFCOS perf row); the depthwise convs lower to XLA's
grouped int8 path.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.head_int8 import _clip8, _gn
from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn
from pytorch_object_detection_tpu.ops.quant import act_scale, weight_qparams

# (name, kernel, dilation) of the five pyramid MNBlocks — nn/fpn.LightweightFPN
FPN_BLOCKS = (("mnb5", 5, 2), ("mnb4", 3, 2), ("mnb3", 3, 1),
              ("mnb6", 5, 1), ("mnb7", 7, 1))
# head MNBlocks: MNHead block1/block2 are MNBlock(f, 3, dilation=2, alpha=2)
HEAD_BLOCKS = (("block1", 3, 2), ("block2", 3, 2))


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_i8(x_q, w_q, pad=0, stride=1, dilation=1, groups=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _conv_f(x, k, bias=None, pad=0, stride=1, dilation=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, k.astype(jnp.float32), (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y if bias is None else y + bias.astype(jnp.float32)


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pool2(x_q):
    return jax.lax.reduce_window(
        x_q, jnp.int8(-128) if x_q.dtype == jnp.int8 else -jnp.inf,
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def _kb(p, scope):
    conv = p[scope]["conv"]
    k = conv["kernel"].astype(jnp.float32)
    b = conv["bias"].astype(jnp.float32) if "bias" in conv else None
    return k, b


# ------------------------------------------------------------ MNBlock


def _mnblock_f32(p, s, x, kernel, dilation, taps, prefix):
    """Float MNBlock recording the three requant-point abs-maxes."""
    pad = dilation * (kernel - 1) // 2
    mult, shift = _fold_bn(p["bn1"], s["bn1"])
    kdw = p["ddw"]["dw"]["conv"]["kernel"]
    a1 = _conv_f(x, kdw, pad=pad, dilation=dilation, groups=x.shape[-1])
    a1 = a1 * mult + shift
    taps[f"{prefix}.a1"] = jnp.max(jnp.abs(a1))
    k1, b1 = _kb(p, "pw1")
    a2 = _silu(_conv_f(a1, k1, b1))
    taps[f"{prefix}.a2"] = jnp.max(jnp.abs(a2))
    k2, b2 = _kb(p, "pw2")
    out = x + _conv_f(a2, k2, b2)
    taps[f"{prefix}.out"] = jnp.max(jnp.abs(out))
    return out


def _quantize_mnblock(p, s) -> Dict:
    """Weight-side quantization of one MNBlock (activation scales are
    attached separately — shared head blocks carry per-level scales).
    Kernel size / dilation are NOT stored here: they must stay static
    under jit, so forwards pass them from FPN_BLOCKS / HEAD_BLOCKS."""
    mult, shift = _fold_bn(p["bn1"], s["bn1"])
    kdw = p["ddw"]["dw"]["conv"]["kernel"].astype(jnp.float32) * mult
    wdw, swdw = weight_qparams(kdw)
    k1, b1 = _kb(p, "pw1")
    w1, sw1 = weight_qparams(k1)
    k2, b2 = _kb(p, "pw2")
    w2, sw2 = weight_qparams(k2)
    return dict(wdw=wdw, swdw=swdw, bdw=shift,
                w1=w1, sw1=sw1, b1=b1, w2=w2, sw2=sw2, b2=b2)


def _mnblock_i8(blk, sc, x_q, kernel: int, dilation: int,
                use_pallas: bool | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """int8 MNBlock: dw+BN -> requant -> pw1+SiLU -> requant -> pw2 +
    residual -> requant.  ``sc``: dict with s_in/s_a1/s_a2/s_out.

    ``use_pallas`` (default: env PODT_QMN=1) routes every block through
    the fused whole-block kernel (ops/pallas_qmnblock — one HBM read/write
    per block vs three int32-accumulator round-trips here).  ALL blocks
    must switch together: a lone XLA depthwise next to Pallas neighbours
    loses its fusion context and hits a pathological emitter (mnb5's
    16x16 dw conv measured 12.5 ms — see the kernel module docstring)."""
    import os

    if use_pallas is None:
        use_pallas = os.environ.get("PODT_QMN", "0") == "1"
    if use_pallas and kernel % 2 == 1 and dilation in (1, 2):
        from pytorch_object_detection_tpu.ops.pallas_qmnblock import qmnblock

        if jax.default_backend() == "cpu":  # tests / PODT_FORCE_CPU
            interpret = True
        return qmnblock(
            x_q, blk["wdw"], blk["swdw"], blk["bdw"],
            blk["w1"], blk["sw1"], blk["b1"], blk["w2"], blk["sw2"], blk["b2"],
            sc["s_in"], sc["s_a1"], sc["s_a2"], sc["s_out"],
            kernel=kernel, dilation=dilation, interpret=interpret,
        )
    k, d = kernel, dilation
    pad = d * (k - 1) // 2
    c = x_q.shape[-1]
    acc = _conv_i8(x_q, blk["wdw"], pad=pad, dilation=d, groups=c)
    a1 = _clip8((acc * (sc["s_in"] * blk["swdw"]) + blk["bdw"]) / sc["s_a1"])
    z = _conv_i8(a1, blk["w1"]) * (sc["s_a1"] * blk["sw1"]) + blk["b1"]
    a2 = _clip8(_silu(z) / sc["s_a2"])
    y = _conv_i8(a2, blk["w2"]) * (sc["s_a2"] * blk["sw2"]) + blk["b2"]
    out = y / sc["s_out"] + x_q.astype(jnp.float32) * (sc["s_in"] / sc["s_out"])
    return _clip8(out)


def _block_scales(taps, prefix, s_in):
    return dict(s_in=jnp.asarray(s_in, jnp.float32),
                s_a1=act_scale(taps[f"{prefix}.a1"]),
                s_a2=act_scale(taps[f"{prefix}.a2"]),
                s_out=act_scale(taps[f"{prefix}.out"]))


# ------------------------------------------------------------ lightweight FPN


def calibrate_lwfpn(fpn_params, fpn_stats, feats) -> Dict[str, jnp.ndarray]:
    """Float LightweightFPN forward recording abs-max at every requant
    point (laterals, top-down sums, MNBlock internals)."""
    p, s = fpn_params, fpn_stats
    c3, c4, c5 = [f.astype(jnp.float32) for f in feats]
    taps: Dict[str, jnp.ndarray] = {}

    def lat(c, scope):
        k, b = _kb(p, scope)
        y = _conv_f(c, k, b)
        return y

    def mnb(x, name, kernel, dilation):
        return _mnblock_f32(p[name], s[name], x, kernel, dilation, taps, name)

    l5 = lat(c5, "lateral5")
    taps["l5"] = jnp.max(jnp.abs(l5))
    p5 = mnb(l5, "mnb5", 5, 2)
    m4 = _up2(p5) + lat(c4, "lateral4")
    taps["m4"] = jnp.max(jnp.abs(m4))
    p4 = mnb(m4, "mnb4", 3, 2)
    m3 = _up2(p4) + lat(c3, "lateral3")
    taps["m3"] = jnp.max(jnp.abs(m3))
    mnb(m3, "mnb3", 3, 1)
    p6 = mnb(_pool2(p5), "mnb6", 5, 1)
    mnb(_pool2(p6), "mnb7", 7, 1)
    return taps


def quantize_lwfpn(fpn_params, fpn_stats, taps, feat_scales: Sequence) -> Dict:
    """Quantize the lightweight FPN; ``feat_scales`` are the int8 scales of
    (C3, C4, C5) from the quantized backbone."""
    p, st = fpn_params, fpn_stats
    s3, s4, s5 = [jnp.asarray(v, jnp.float32) for v in feat_scales]
    q: Dict = {}

    def lat(scope, s_in, s_out):
        k, b = _kb(p, scope)
        wq, sw = weight_qparams(k)
        return dict(w=wq, A=s_in * sw / s_out, B=b / s_out)

    s_l5 = act_scale(taps["l5"])
    s_m4 = act_scale(taps["m4"])
    s_m3 = act_scale(taps["m3"])
    q["lateral5"] = lat("lateral5", s5, s_l5)
    q["lateral4"] = lat("lateral4", s4, s_m4)
    q["lateral3"] = lat("lateral3", s3, s_m3)
    for name, _, _ in FPN_BLOCKS:
        q[name] = _quantize_mnblock(p[name], st[name])
    sc = {}
    sc["mnb5"] = _block_scales(taps, "mnb5", s_l5)
    sc["mnb4"] = _block_scales(taps, "mnb4", s_m4)
    sc["mnb3"] = _block_scales(taps, "mnb3", s_m3)
    sc["mnb6"] = _block_scales(taps, "mnb6", sc["mnb5"]["s_out"])
    sc["mnb7"] = _block_scales(taps, "mnb7", sc["mnb6"]["s_out"])
    q["sc"] = sc
    q["p5_to_m4"] = sc["mnb5"]["s_out"] / s_m4
    q["p4_to_m3"] = sc["mnb4"]["s_out"] / s_m3
    return q


def lwfpn_int8_forward(qtree, feats_q, compute_dtype=jnp.bfloat16,
                       dequant: bool = True):
    """(C3, C4, C5) int8 -> five int8 pyramid levels (or dequantized)."""
    c3, c4, c5 = feats_q
    sc = qtree["sc"]

    def lat(x_q, blk, partner=None, p_mul=None):
        y = _conv_i8(x_q, blk["w"]) * blk["A"] + blk["B"]
        if partner is not None:
            y = y + partner.astype(jnp.float32) * p_mul
        return _clip8(y)

    kd = {name: (k, d) for name, k, d in FPN_BLOCKS}
    l5 = lat(c5, qtree["lateral5"])
    p5 = _mnblock_i8(qtree["mnb5"], sc["mnb5"], l5, *kd["mnb5"])
    m4 = lat(c4, qtree["lateral4"], partner=_up2(p5), p_mul=qtree["p5_to_m4"])
    p4 = _mnblock_i8(qtree["mnb4"], sc["mnb4"], m4, *kd["mnb4"])
    m3 = lat(c3, qtree["lateral3"], partner=_up2(p4), p_mul=qtree["p4_to_m3"])
    p3 = _mnblock_i8(qtree["mnb3"], sc["mnb3"], m3, *kd["mnb3"])
    p6 = _mnblock_i8(qtree["mnb6"], sc["mnb6"], _pool2(p5), *kd["mnb6"])
    p7 = _mnblock_i8(qtree["mnb7"], sc["mnb7"], _pool2(p6), *kd["mnb7"])

    levels = [p3, p4, p5, p6, p7]
    scales = [sc["mnb3"]["s_out"], sc["mnb4"]["s_out"], sc["mnb5"]["s_out"],
              sc["mnb6"]["s_out"], sc["mnb7"]["s_out"]]
    if not dequant:
        return levels, scales
    return [l.astype(jnp.float32).astype(compute_dtype) * s.astype(compute_dtype)
            for l, s in zip(levels, scales)]


# ------------------------------------------------------------ MN head


def calibrate_mnhead(head_params, head_stats, levels) -> Dict[str, jnp.ndarray]:
    """Float MNHead forward recording per-level abs-maxes (MNBlock
    internals + the two GN towers)."""
    p, s = head_params, head_stats
    taps: Dict[str, jnp.ndarray] = {}
    for i, x in enumerate(levels):
        y = x.astype(jnp.float32)
        for name, kernel, dil in HEAD_BLOCKS:
            y = _mnblock_f32(p[name], s[name], y, kernel, dil, taps,
                             f"L{i}.{name}")
        kc, _ = _kb(p, "cls_tower0")
        c = _gn(_conv_f(y, kc, pad=1),
                p["cls_gn0"]["gn"]["scale"].astype(jnp.float32),
                p["cls_gn0"]["gn"]["bias"].astype(jnp.float32), act="silu")
        taps[f"L{i}.c"] = jnp.max(jnp.abs(c))
        kr, _ = _kb(p, "reg_tower0")
        r = _gn(_conv_f(y, kr, pad=1),
                p["reg_gn0"]["gn"]["scale"].astype(jnp.float32),
                p["reg_gn0"]["gn"]["bias"].astype(jnp.float32), act="silu")
        taps[f"L{i}.r"] = jnp.max(jnp.abs(r))
    return taps


def quantize_mnhead(head_params, head_stats, taps, level_scales: Sequence,
                    num_classes: int) -> Dict:
    """Shared block/tower/pred weights quantized once; per-level scales."""
    p, st = head_params, head_stats
    q: Dict = {"num_classes": num_classes}
    for name, _, _ in HEAD_BLOCKS:
        q[name] = _quantize_mnblock(p[name], st[name])
    kc, _ = _kb(p, "cls_tower0")
    q["wc"], swc = weight_qparams(kc)
    kr, _ = _kb(p, "reg_tower0")
    q["wr"], swr = weight_qparams(kr)
    q["gnc"] = (p["cls_gn0"]["gn"]["scale"].astype(jnp.float32),
                p["cls_gn0"]["gn"]["bias"].astype(jnp.float32))
    q["gnr"] = (p["reg_gn0"]["gn"]["scale"].astype(jnp.float32),
                p["reg_gn0"]["gn"]["bias"].astype(jnp.float32))
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
        lv: Dict = {}
        s_prev = jnp.asarray(s_lv, jnp.float32)
        for name, _, _ in HEAD_BLOCKS:
            lv[name] = _block_scales(taps, f"L{i}.{name}", s_prev)
            s_prev = lv[name]["s_out"]
        s_c = act_scale(taps[f"L{i}.c"])
        s_r = act_scale(taps[f"L{i}.r"])
        lv["Ac"] = s_prev * swc
        lv["inv_c"] = 1.0 / s_c
        lv["Ar"] = s_prev * swr
        lv["inv_r"] = 1.0 / s_r
        lv["Apc"] = s_c * swpc
        lv["Acr"] = s_r * swcr
        levels.append(lv)
    q["levels"] = levels
    return q


def mnhead_int8_forward(q, levels_q, num_classes: int | None = None
                        ) -> Tuple[List, List, List]:
    """Per-level fp32 (cls, cnt, reg); contract matches MNHead.apply
    (reg exp-activated through the per-level ScaleExp)."""
    cls_l, cnt_l, reg_l = [], [], []
    for i, x_q in enumerate(levels_q):
        lv = q["levels"][i]
        y = x_q
        for name, kernel, dil in HEAD_BLOCKS:
            y = _mnblock_i8(q[name], lv[name], y, kernel, dil)
        zc = _conv_i8(y, q["wc"], pad=1) * lv["Ac"]
        c = _clip8(_gn(zc, *q["gnc"], act="silu") * lv["inv_c"])
        zr = _conv_i8(y, q["wr"], pad=1) * lv["Ar"]
        r = _clip8(_gn(zr, *q["gnr"], act="silu") * lv["inv_r"])
        cls = _conv_i8(c, q["wpc"]) * lv["Apc"] + q["bpc"]
        cr = _conv_i8(r, q["wcr"]) * lv["Acr"] + q["bcr"]
        s = q["scale_exp"][i]
        cls_l.append(cls.astype(jnp.float32))
        cnt_l.append(cr[..., :1].astype(jnp.float32))
        reg_l.append(jnp.exp(cr[..., 1:5].astype(jnp.float32) * s))
    return cls_l, cnt_l, reg_l
