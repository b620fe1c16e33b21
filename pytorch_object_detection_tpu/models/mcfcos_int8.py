"""int8 PTQ serving ladder for MC_FCOS (CSP/MBConv FFM + FPN + refine).

Closes the int8 coverage of the model zoo (VERDICT r3 #6): MC-FCOS — the
reference's experimental 4-level detector (`/root/reference/model/od/
Mc_Fcos.py:9-223`) — now serves through the same PTQ scheme as its
siblings (nn/fpn_int8, models/{fcos,mnfcos,retinanet,ssd}_int8):

  * weights per-out-channel int8 with the trailing BatchNorm folded into
    the conv (kernel * gamma/sigma, bias into the f32 epilogue);
  * activations per-tensor abs-max calibrated at every requant point,
    SiLU runs in the f32 epilogue before the requant (symmetric int8
    carries its negative tail);
  * the SE gate is computed in f32 from the int8 tensor's GAP (tiny
    [B,1,1,C] work) and applied as one fused dequant->mul->requant pass
    at the SAME scale (gate <= 1 so no clipping);
  * channel-concats feeding a 1x1 conv are handled exactly by splitting
    the int8 kernel along input channels (conv(cat[a,b]) = conv_a(a) +
    conv_b(b)) so no cross-branch requant is needed; elementwise sums of
    two int8 tensors (top-down adds, refine outputs) requant to a
    calibrated sum scale in one f32 pass;
  * head tower weights are shared across the 4 levels with PER-LEVEL
    activation scales; cnt/reg preds pack into one 5-channel conv.  Like
    the float model (and the reference, which has no ScaleExp here —
    Mc_Fcos.py:188-223), reg is the RAW conv output.

XLA int8 convs throughout (capability row — fused Pallas kernels are the
HISFCOS perf row).  Backbone: the shared ResNet-50 int8 ladder
(nn/resnet_int8), so MC_FCOS serves from raw uint8 frames too.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.head_int8 import _clip8
from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn
from pytorch_object_detection_tpu.ops.quant import act_scale, weight_qparams

NUM_TOWER = 4


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_i8(x_q, w_q, pad=0, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _conv_f(x, k, bias=None, pad=0, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, k.astype(jnp.float32), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y if bias is None else y + bias.astype(jnp.float32)


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pool2(x):
    return jax.lax.reduce_window(
        x, jnp.asarray(-128 if x.dtype == jnp.int8 else -jnp.inf, x.dtype),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def _kb(p, scope):
    conv = p[scope]["conv"]
    k = conv["kernel"].astype(jnp.float32)
    b = conv["bias"].astype(jnp.float32) if "bias" in conv else None
    return k, b


def _fold(p, s, conv_scope, bn_scope):
    """kernel/bias with the trailing BN folded in."""
    k, b = _kb(p, conv_scope)
    mult, shift = _fold_bn(p[bn_scope], s[bn_scope])
    k = k * mult  # broadcast over the out-channel (last) axis
    b = shift if b is None else b * mult + shift
    return k, b


def _dw_kernel(p, scope):
    return p[scope]["dw"]["conv"]["kernel"].astype(jnp.float32)


# ------------------------------------------------------------------ MCBlock


def _mcblock_f32(p, s, x, taps, prefix):
    """Float MCBlock (models/mcfcos.py:30-52) recording requant abs-maxes."""
    k, b = _fold(p, s, "pw1", "bn1")
    a1 = _silu(_conv_f(x, k, b))
    taps[f"{prefix}.a1"] = jnp.max(jnp.abs(a1))
    kdw = _dw_kernel(p, "dw")
    mult, shift = _fold_bn(p["bn2"], s["bn2"])
    a2 = _silu(_conv_f(a1, kdw * mult, shift, pad=1, groups=a1.shape[-1]))
    taps[f"{prefix}.a2"] = jnp.max(jnp.abs(a2))
    # SE gate (f32 throughout)
    g = jnp.mean(a2, axis=(1, 2), keepdims=True)
    k1, b1 = _kb(p["se"], "fc1")
    k2, b2 = _kb(p["se"], "fc2")
    g = jax.nn.sigmoid(_conv_f(_silu(_conv_f(g, k1, b1)), k2, b2))
    a2 = a2 * g
    k, b = _fold(p, s, "pw3", "bn3")
    y = _silu(_conv_f(a2, k, b))
    ks, bs = _fold(p, s, "pw4", "bn4")
    skip = _silu(_conv_f(a1, ks, bs))
    cat = jnp.concatenate([y, skip], axis=-1)
    taps[f"{prefix}.cat"] = jnp.max(jnp.abs(cat))
    k, b = _fold(p, s, "pw5", "bn5")
    out = _silu(_conv_f(cat, k, b))
    taps[f"{prefix}.out"] = jnp.max(jnp.abs(out))
    return out


def _quantize_mcblock(p, s, taps, prefix, s_in: Sequence) -> Dict:
    """s_in: input scale per concat part (one entry for a plain input)."""
    sa1 = act_scale(taps[f"{prefix}.a1"])
    sa2 = act_scale(taps[f"{prefix}.a2"])
    scat = act_scale(taps[f"{prefix}.cat"])
    sout = act_scale(taps[f"{prefix}.out"])
    q: Dict = {"s_out": jnp.asarray(sout, jnp.float32)}

    k, b = _fold(p, s, "pw1", "bn1")
    wq, sw = weight_qparams(k)
    # per-part input scales; part channel sizes resolve at forward time
    q["pw1"] = dict(w=wq, A=[jnp.asarray(si, jnp.float32) * sw for si in s_in],
                    B=b, inv=1.0 / sa1)
    kdw = _dw_kernel(p, "dw")
    mult, shift = _fold_bn(p["bn2"], s["bn2"])
    wq, sw = weight_qparams(kdw * mult)
    q["dw"] = dict(w=wq, A=sa1 * sw, B=shift, inv=1.0 / sa2)
    q["se"] = dict(
        k1=p["se"]["fc1"]["conv"]["kernel"].astype(jnp.float32),
        b1=p["se"]["fc1"]["conv"]["bias"].astype(jnp.float32),
        k2=p["se"]["fc2"]["conv"]["kernel"].astype(jnp.float32),
        b2=p["se"]["fc2"]["conv"]["bias"].astype(jnp.float32),
        s_a2=jnp.asarray(sa2, jnp.float32),
    )
    k, b = _fold(p, s, "pw3", "bn3")
    wq, sw = weight_qparams(k)
    q["pw3"] = dict(w=wq, A=sa2 * sw, B=b, inv=1.0 / scat)
    k, b = _fold(p, s, "pw4", "bn4")
    wq, sw = weight_qparams(k)
    q["pw4"] = dict(w=wq, A=sa1 * sw, B=b, inv=1.0 / scat)
    k, b = _fold(p, s, "pw5", "bn5")
    wq, sw = weight_qparams(k)
    q["pw5"] = dict(w=wq, A=scat * sw, B=b, inv=1.0 / sout)
    return q


def _mcblock_i8(q, parts: List) -> jnp.ndarray:
    """parts: list of int8 tensors (input-channel concat order).  Returns
    the int8 block output at scale q['s_out']."""
    blk = q["pw1"]
    off = 0
    acc = None
    for x_q, A in zip(parts, blk["A"]):
        c = x_q.shape[-1]
        w = jax.lax.slice_in_dim(blk["w"], off, off + c, axis=2)
        z = _conv_i8(x_q, w) * A
        acc = z if acc is None else acc + z
        off += c
    a1 = _clip8(_silu(acc + blk["B"]) * blk["inv"])

    blk = q["dw"]
    z = _conv_i8(a1, blk["w"], pad=1, groups=a1.shape[-1])
    a2 = _clip8(_silu(z * blk["A"] + blk["B"]) * blk["inv"])

    se = q["se"]
    g = jnp.mean(a2.astype(jnp.float32), axis=(1, 2), keepdims=True) * se["s_a2"]
    g = jax.nn.sigmoid(_conv_f(_silu(_conv_f(g, se["k1"], se["b1"])), se["k2"], se["b2"]))
    a2 = _clip8(a2.astype(jnp.float32) * g)  # same scale: gate <= 1

    blk = q["pw3"]
    y = _clip8(_silu(_conv_i8(a2, blk["w"]) * blk["A"] + blk["B"]) * blk["inv"])
    blk = q["pw4"]
    skip = _clip8(_silu(_conv_i8(a1, blk["w"]) * blk["A"] + blk["B"]) * blk["inv"])
    cat = jnp.concatenate([y, skip], axis=-1)
    blk = q["pw5"]
    return _clip8(_silu(_conv_i8(cat, blk["w"]) * blk["A"] + blk["B"]) * blk["inv"])


# ------------------------------------------------------- neck (FFM+FPN+refine)


def calibrate_mcfcos_neck_head(params, stats, feats) -> Dict[str, jnp.ndarray]:
    """Float post-backbone forward (models/mcfcos.py:82-118 exactly, frozen
    BN) recording abs-max at every requant point."""
    p, s = params, stats
    c3, c4, c5 = [f.astype(jnp.float32) for f in feats]
    taps: Dict[str, jnp.ndarray] = {}

    x4 = _mcblock_f32(p["mb_top"], s["mb_top"], _pool2(c5), taps, "mb_top")

    k, b = _kb(p, "ffm_pw1")
    t = _conv_f(jnp.concatenate([c4, _up2(c5)], axis=-1), k, b)
    taps["ffm1"] = jnp.max(jnp.abs(t))
    x2 = _mcblock_f32(p["ffm_mb1"], s["ffm_mb1"], t, taps, "ffm_mb1")
    k, b = _kb(p, "ffm_pw2")
    t = _conv_f(jnp.concatenate([c3, _up2(c4)], axis=-1), k, b)
    taps["ffm2"] = jnp.max(jnp.abs(t))
    x1 = _mcblock_f32(p["ffm_mb2"], s["ffm_mb2"], t, taps, "ffm_mb2")

    k, _ = _kb(p, "tf1_conv")
    mult, shift = _fold_bn(p["tf1_bn"], s["tf1_bn"])
    x3 = _silu(_conv_f(c5, k * mult, shift))
    taps["tf1"] = jnp.max(jnp.abs(x3))

    p1 = _mcblock_f32(p["fpn_mb1"], s["fpn_mb1"], x3, taps, "fpn_mb1")
    t = _up2(p1) + x2
    taps["p2in"] = jnp.max(jnp.abs(t))
    p2 = _mcblock_f32(p["fpn_mb2"], s["fpn_mb2"], t, taps, "fpn_mb2")
    t = _up2(p2) + x1
    taps["p3in"] = jnp.max(jnp.abs(t))
    p3 = _mcblock_f32(p["fpn_mb3"], s["fpn_mb3"], t, taps, "fpn_mb3")

    c1 = _mcblock_f32(p["refine_mb1"], s["refine_mb1"],
                      jnp.concatenate([_up2(p1), p2], axis=-1), taps, "refine_mb1")
    c1 = _mcblock_f32(p["refine_mb2"], s["refine_mb2"],
                      jnp.concatenate([c1, _pool2(p3)], axis=-1), taps, "refine_mb2")
    h1 = _up2(c1) + p3
    taps["h1"] = jnp.max(jnp.abs(h1))
    k, _ = _kb(p, "refine_conv")
    h2 = _conv_f(c1, k, pad=1) + p2
    taps["h2"] = jnp.max(jnp.abs(h2))
    d = _pool2(c1)
    h3 = d + p1
    taps["h3"] = jnp.max(jnp.abs(h3))
    h4 = _pool2(d) + x4
    taps["h4"] = jnp.max(jnp.abs(h4))

    hp, hs = p["head"], s["head"]
    for i, x in enumerate((h1, h2, h3, h4)):
        for j in range(NUM_TOWER):
            k, b = _fold(hp, hs, f"conv{j}", f"bn{j}")
            x = _silu(_conv_f(x, k, b, pad=1))
            taps[f"L{i}.t{j}"] = jnp.max(jnp.abs(x))
    return taps


def quantize_mcfcos_neck_head(params, stats, taps, feat_scales: Sequence,
                              num_classes: int) -> Dict:
    p, s = params, stats
    s3, s4, s5 = [jnp.asarray(v, jnp.float32) for v in feat_scales]
    a = {k: act_scale(v) for k, v in taps.items()}
    q: Dict = {"num_classes": num_classes}

    q["mb_top"] = _quantize_mcblock(p["mb_top"], s["mb_top"], taps, "mb_top", [s5])

    k, b = _kb(p, "ffm_pw1")
    wq, sw = weight_qparams(k)
    q["ffm_pw1"] = dict(w=wq, A=[s4 * sw, s5 * sw], B=b, inv=1.0 / a["ffm1"])
    q["ffm_mb1"] = _quantize_mcblock(p["ffm_mb1"], s["ffm_mb1"], taps,
                                     "ffm_mb1", [a["ffm1"]])
    k, b = _kb(p, "ffm_pw2")
    wq, sw = weight_qparams(k)
    q["ffm_pw2"] = dict(w=wq, A=[s3 * sw, s4 * sw], B=b, inv=1.0 / a["ffm2"])
    q["ffm_mb2"] = _quantize_mcblock(p["ffm_mb2"], s["ffm_mb2"], taps,
                                     "ffm_mb2", [a["ffm2"]])

    k, _ = _kb(p, "tf1_conv")
    mult, shift = _fold_bn(p["tf1_bn"], s["tf1_bn"])
    wq, sw = weight_qparams(k * mult)
    q["tf1"] = dict(w=wq, A=s5 * sw, B=shift, inv=1.0 / a["tf1"])

    q["fpn_mb1"] = _quantize_mcblock(p["fpn_mb1"], s["fpn_mb1"], taps,
                                     "fpn_mb1", [a["tf1"]])
    s_p1 = q["fpn_mb1"]["s_out"]
    s_x2 = q["ffm_mb1"]["s_out"]
    q["p2in"] = dict(m1=s_p1 / a["p2in"], m2=s_x2 / a["p2in"])
    q["fpn_mb2"] = _quantize_mcblock(p["fpn_mb2"], s["fpn_mb2"], taps,
                                     "fpn_mb2", [a["p2in"]])
    s_p2 = q["fpn_mb2"]["s_out"]
    s_x1 = q["ffm_mb2"]["s_out"]
    q["p3in"] = dict(m1=s_p2 / a["p3in"], m2=s_x1 / a["p3in"])
    q["fpn_mb3"] = _quantize_mcblock(p["fpn_mb3"], s["fpn_mb3"], taps,
                                     "fpn_mb3", [a["p3in"]])
    s_p3 = q["fpn_mb3"]["s_out"]

    q["refine_mb1"] = _quantize_mcblock(p["refine_mb1"], s["refine_mb1"], taps,
                                        "refine_mb1", [s_p1, s_p2])
    s_c1a = q["refine_mb1"]["s_out"]
    q["refine_mb2"] = _quantize_mcblock(p["refine_mb2"], s["refine_mb2"], taps,
                                        "refine_mb2", [s_c1a, s_p3])
    s_c1 = q["refine_mb2"]["s_out"]
    s_x4 = q["mb_top"]["s_out"]

    q["h1"] = dict(m1=s_c1 / a["h1"], m2=s_p3 / a["h1"])
    k, _ = _kb(p, "refine_conv")
    wq, sw = weight_qparams(k)
    q["h2"] = dict(w=wq, A=s_c1 * sw / a["h2"], m2=s_p2 / a["h2"])
    q["h3"] = dict(m1=s_c1 / a["h3"], m2=s_p1 / a["h3"])
    q["h4"] = dict(m1=s_c1 / a["h4"], m2=s_x4 / a["h4"])

    # head: shared folded tower weights, per-level scale chains
    hp, hs = p["head"], s["head"]
    sws = []
    for j in range(NUM_TOWER):
        k, b = _fold(hp, hs, f"conv{j}", f"bn{j}")
        wq, sw = weight_qparams(k)
        q[f"wt{j}"] = wq
        q[f"bt{j}"] = b
        sws.append(sw)
    wpc, swpc = weight_qparams(hp["cls"]["conv"]["kernel"].astype(jnp.float32))
    kcr = jnp.concatenate([
        hp["cnt"]["conv"]["kernel"].astype(jnp.float32),
        hp["reg"]["conv"]["kernel"].astype(jnp.float32),
    ], axis=-1)
    wcr, swcr = weight_qparams(kcr)
    q.update(wpc=wpc, wcr=wcr)
    levels = []
    for i, s_h in enumerate((a["h1"], a["h2"], a["h3"], a["h4"])):
        s_prev = jnp.asarray(s_h, jnp.float32)
        lv: Dict = {}
        for j in range(NUM_TOWER):
            s_t = act_scale(taps[f"L{i}.t{j}"])
            lv[f"A{j}"] = s_prev * sws[j]
            lv[f"inv{j}"] = 1.0 / s_t
            s_prev = s_t
        lv["Apc"] = s_prev * swpc
        lv["Acr"] = s_prev * swcr
        levels.append(lv)
    q["levels"] = levels
    return q


def mcfcos_neck_head_int8(q, feats_q) -> Tuple[List, List, List]:
    """(C3,C4,C5) int8 (scales pre-folded at quantize time) -> per-level
    fp32 (cls, cnt, reg) for strides (8, 16, 32, 64); reg is the raw conv
    output (MC_FCOS has no ScaleExp — Mc_Fcos.py:188-223)."""
    c3, c4, c5 = feats_q

    x4 = _mcblock_i8(q["mb_top"], [_pool2(c5)])

    blk = q["ffm_pw1"]
    acc = (_conv_i8(c4, jax.lax.slice_in_dim(blk["w"], 0, c4.shape[-1], axis=2))
           * blk["A"][0]
           + _conv_i8(_up2(c5), jax.lax.slice_in_dim(
               blk["w"], c4.shape[-1], c4.shape[-1] + c5.shape[-1], axis=2))
           * blk["A"][1])
    t = _clip8((acc + blk["B"]) * blk["inv"])
    x2 = _mcblock_i8(q["ffm_mb1"], [t])
    blk = q["ffm_pw2"]
    acc = (_conv_i8(c3, jax.lax.slice_in_dim(blk["w"], 0, c3.shape[-1], axis=2))
           * blk["A"][0]
           + _conv_i8(_up2(c4), jax.lax.slice_in_dim(
               blk["w"], c3.shape[-1], c3.shape[-1] + c4.shape[-1], axis=2))
           * blk["A"][1])
    t = _clip8((acc + blk["B"]) * blk["inv"])
    x1 = _mcblock_i8(q["ffm_mb2"], [t])

    blk = q["tf1"]
    x3 = _clip8(_silu(_conv_i8(c5, blk["w"]) * blk["A"] + blk["B"]) * blk["inv"])

    p1 = _mcblock_i8(q["fpn_mb1"], [x3])
    blk = q["p2in"]
    t = _clip8(_up2(p1).astype(jnp.float32) * blk["m1"]
               + x2.astype(jnp.float32) * blk["m2"])
    p2 = _mcblock_i8(q["fpn_mb2"], [t])
    blk = q["p3in"]
    t = _clip8(_up2(p2).astype(jnp.float32) * blk["m1"]
               + x1.astype(jnp.float32) * blk["m2"])
    p3 = _mcblock_i8(q["fpn_mb3"], [t])

    c1 = _mcblock_i8(q["refine_mb1"], [_up2(p1), p2])
    c1 = _mcblock_i8(q["refine_mb2"], [c1, _pool2(p3)])

    blk = q["h1"]
    h1 = _clip8(_up2(c1).astype(jnp.float32) * blk["m1"]
                + p3.astype(jnp.float32) * blk["m2"])
    blk = q["h2"]
    h2 = _clip8(_conv_i8(c1, blk["w"], pad=1) * blk["A"]
                + p2.astype(jnp.float32) * blk["m2"])
    d = _pool2(c1)
    blk = q["h3"]
    h3 = _clip8(d.astype(jnp.float32) * blk["m1"]
                + p1.astype(jnp.float32) * blk["m2"])
    blk = q["h4"]
    h4 = _clip8(_pool2(d).astype(jnp.float32) * blk["m1"]
                + x4.astype(jnp.float32) * blk["m2"])

    cls_l, cnt_l, reg_l = [], [], []
    for i, x in enumerate((h1, h2, h3, h4)):
        lv = q["levels"][i]
        for j in range(NUM_TOWER):
            z = _conv_i8(x, q[f"wt{j}"], pad=1) * lv[f"A{j}"] + q[f"bt{j}"]
            x = _clip8(_silu(z) * lv[f"inv{j}"])
        cls = _conv_i8(x, q["wpc"], pad=1) * lv["Apc"]
        cr = _conv_i8(x, q["wcr"], pad=1) * lv["Acr"]
        cls_l.append(cls.astype(jnp.float32))
        cnt_l.append(cr[..., :1].astype(jnp.float32))
        reg_l.append(cr[..., 1:5].astype(jnp.float32))
    return cls_l, cnt_l, reg_l


# ---------------------------------------------------------------- one-shot


def quantize_mcfcos(model, variables, calib_images, backend: str = "xla",
                    mean=None, std=None) -> Dict:
    """Full-detector PTQ: ResNet-50 int8 ladder (shared, trainer.
    quantize_backbone) + this neck/head ladder, calibrated on the int8
    backbone's dequantized features (the serving distribution).
    ``mean``/``std`` feed the exact uint8 s2d stem fold (ImageNet
    defaults)."""
    from pytorch_object_detection_tpu.train.trainer import (
        _backbone_int8_feats,
        quantize_backbone,
    )

    qbb = quantize_backbone(model, variables, calib_images, mean=mean, std=std)
    feats_q, scales = jax.jit(
        lambda im: _backbone_int8_feats(model, qbb, im)
    )(calib_images)
    feats = tuple(fq.astype(jnp.float32) * sc for fq, sc in zip(feats_q, scales))
    taps = jax.jit(calibrate_mcfcos_neck_head)(
        variables["params"], variables["batch_stats"], feats
    )
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    qnh = jax.jit(
        lambda p, s: quantize_mcfcos_neck_head(p, s, taps, scales,
                                               model.num_classes)
    )(variables["params"], variables["batch_stats"])
    return {"backbone": qbb, "neck_head": qnh}


def mcfcos_int8_forward(model, qtree, images, backend: str = "xla",
                        u8_stem: bool = False) -> Tuple[List, List, List]:
    """Images (normalized f32, or raw uint8 frames with ``u8_stem``) ->
    per-level fp32 (cls, cnt, reg); contract matches MC_FCOS.apply."""
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward

    feats_q, _ = resnet50_int8_forward(
        qtree["backbone"], images, jnp.float32, backend=backend,
        dequant=False, u8_stem=u8_stem,
    )
    return mcfcos_neck_head_int8(qtree["neck_head"], feats_q)
