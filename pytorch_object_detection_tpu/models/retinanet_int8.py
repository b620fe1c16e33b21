"""int8 PTQ serving ladder for RetinaNet (RetinaFPN + 4-conv ReLU subnets).

Extends the serving dtype ladder to the anchor-based family: the int8
ResNet-50 (nn/resnet_int8.py) feeds a quantized RetinaFPN — conv+BN+ReLU
blocks with the BN folded into the conv weights (reference structure
`/root/reference/model/od/RetinaNet.py:28-60`) — and quantized shared
cls/reg subnets (4x conv3x3+ReLU towers + pred convs,
`RetinaNet.py:62-105`).  No norm layers live in the head, so every requant
point is a plain f32 epilogue: ``acc * A + B -> relu -> clip`` (bias rides
the epilogue, scale algebra pre-folded at quantization time).

Scheme matches the FCOS-family ladders (models/fcos_int8.py): weights
per-out-channel int8, activations per-tensor abs-max calibrated per requant
point; tower weights are shared across levels, activation scales are PER
LEVEL; top-down adds run f32 fused into the consuming conv's epilogue with
the upsampled partner rescaled by s_prev/s_sum.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.fcos_int8 import _conv_i8, _up2
from pytorch_object_detection_tpu.models.head_int8 import _clip8
from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn
from pytorch_object_detection_tpu.ops.quant import act_scale, weight_qparams

NUM_TOWER = 4
FPN_BLOCKS = ("p5_1", "p5_2", "p4_1", "p4_2", "p3_1", "p3_2", "p6", "p7")


def _cba_folded(p, s, scope) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """conv+BN folded: effective (kernel, bias) of one RetinaFPN block."""
    k = p[f"{scope}_conv"]["conv"]["kernel"].astype(jnp.float32)
    mult, add = _fold_bn(p[f"{scope}_bn"], s[f"{scope}_bn"])
    return k * mult, add


def _conv_f(x, k, b, pad=0, stride=1):
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


# ------------------------------------------------------------ RetinaFPN


def calibrate_retinafpn(fpn_params, fpn_stats, feats) -> Dict[str, jnp.ndarray]:
    """Folded float forward recording abs-max at every requant point."""
    p, s = fpn_params, fpn_stats
    c3, c4, c5 = [f.astype(jnp.float32) for f in feats]
    kb = {sc: _cba_folded(p, s, sc) for sc in FPN_BLOCKS}
    r = jax.nn.relu
    taps: Dict[str, jnp.ndarray] = {}

    t5 = r(_conv_f(c5, *kb["p5_1"]))
    taps["t5"] = jnp.max(jnp.abs(t5))
    p5 = r(_conv_f(t5, *kb["p5_2"], pad=1))
    taps["p5"] = jnp.max(jnp.abs(p5))
    m4 = r(_conv_f(c4, *kb["p4_1"])) + _up2(t5)
    taps["m4"] = jnp.max(jnp.abs(m4))
    p4 = r(_conv_f(m4, *kb["p4_2"], pad=1))
    taps["p4"] = jnp.max(jnp.abs(p4))
    m3 = r(_conv_f(c3, *kb["p3_1"])) + _up2(m4)
    taps["m3"] = jnp.max(jnp.abs(m3))
    p3 = r(_conv_f(m3, *kb["p3_2"], pad=1))
    taps["p3"] = jnp.max(jnp.abs(p3))
    p6 = r(_conv_f(c5, *kb["p6"], pad=1, stride=2))
    taps["p6"] = jnp.max(jnp.abs(p6))
    p7 = r(_conv_f(p6, *kb["p7"], pad=1, stride=2))
    taps["p7"] = jnp.max(jnp.abs(p7))
    return taps


def quantize_retinafpn(fpn_params, fpn_stats, taps, feat_scales: Sequence) -> Dict:
    """Quantize the BN-folded FPN weights + pre-fold the epilogue algebra.

    feat_scales: int8 scales of (C3, C4, C5) from
    ``resnet50_int8_forward(..., dequant=False)``.
    """
    p, st = fpn_params, fpn_stats
    s3, s4, s5 = [jnp.asarray(x, jnp.float32) for x in feat_scales]
    s = {k: act_scale(v) for k, v in taps.items()}
    q: Dict = {"scales": {k: jnp.asarray(v, jnp.float32) for k, v in s.items()}}

    def blk(scope, s_in, s_out):
        k, b = _cba_folded(p, st, scope)
        wq, sw = weight_qparams(k)
        return dict(w=wq, A=s_in * sw / s_out, B=b / s_out)

    q["p5_1"] = blk("p5_1", s5, s["t5"])
    q["p5_2"] = blk("p5_2", s["t5"], s["p5"])
    q["p4_1"] = blk("p4_1", s4, s["m4"])
    q["p4_2"] = blk("p4_2", s["m4"], s["p4"])
    q["p3_1"] = blk("p3_1", s3, s["m3"])
    q["p3_2"] = blk("p3_2", s["m3"], s["p3"])
    q["p6"] = blk("p6", s5, s["p6"])
    q["p7"] = blk("p7", s["p6"], s["p7"])
    q["t5_to_m4"] = s["t5"] / s["m4"]
    q["m4_to_m3"] = s["m4"] / s["m3"]
    return q


def retinafpn_int8_forward(qtree, feats_q, compute_dtype=jnp.bfloat16,
                           dequant: bool = True):
    """(C3, C4, C5) int8 -> five int8 pyramid levels (or dequantized)."""
    c3, c4, c5 = feats_q

    def rq(x_q, blk, pad=0, stride=1, partner=None, p_mul=None):
        acc = _conv_i8(x_q, blk["w"], pad=pad, stride=stride)
        y = jnp.maximum(acc * blk["A"] + blk["B"], 0.0)  # relu BEFORE the add
        if partner is not None:
            y = y + partner.astype(jnp.float32) * p_mul
        return _clip8(y)

    t5 = rq(c5, qtree["p5_1"])
    p5 = rq(t5, qtree["p5_2"], pad=1)
    m4 = rq(c4, qtree["p4_1"], partner=_up2(t5), p_mul=qtree["t5_to_m4"])
    p4 = rq(m4, qtree["p4_2"], pad=1)
    m3 = rq(c3, qtree["p3_1"], partner=_up2(m4), p_mul=qtree["m4_to_m3"])
    p3 = rq(m3, qtree["p3_2"], pad=1)
    p6 = rq(c5, qtree["p6"], pad=1, stride=2)
    p7 = rq(p6, qtree["p7"], pad=1, stride=2)

    levels = [p3, p4, p5, p6, p7]
    s = qtree["scales"]
    scales = [s["p3"], s["p4"], s["p5"], s["p6"], s["p7"]]
    if not dequant:
        return levels, scales
    return [l.astype(jnp.float32).astype(compute_dtype) * sc.astype(compute_dtype)
            for l, sc in zip(levels, scales)]


# ------------------------------------------------------------ subnets


def _kb(p, scope):
    conv = p[scope]["conv"]
    k = conv["kernel"].astype(jnp.float32)
    b = (conv["bias"].astype(jnp.float32) if "bias" in conv
         else jnp.zeros((k.shape[-1],), jnp.float32))
    return k, b


def calibrate_retinahead(head_params, levels) -> Dict[str, jnp.ndarray]:
    """Float subnet forward recording per-level abs-max after every
    tower conv+ReLU (4 cls + 4 reg points per level)."""
    taps: Dict[str, jnp.ndarray] = {}
    for i, x in enumerate(levels):
        c = r = x.astype(jnp.float32)
        for j in range(NUM_TOWER):
            kc, bc = _kb(head_params["classification"], f"conv{j}")
            c = jax.nn.relu(_conv_f(c, kc, bc, pad=1))
            taps[f"L{i}.c{j}"] = jnp.max(jnp.abs(c))
            kr, br = _kb(head_params["regression"], f"conv{j}")
            r = jax.nn.relu(_conv_f(r, kr, br, pad=1))
            taps[f"L{i}.r{j}"] = jnp.max(jnp.abs(r))
    return taps


def quantize_retinahead(head_params, taps, level_scales: Sequence) -> Dict:
    """Shared tower/pred weights quantized once; per-level epilogues."""
    q: Dict = {}
    swc, swr = [], []
    for j in range(NUM_TOWER):
        kc, bc = _kb(head_params["classification"], f"conv{j}")
        wq, sw = weight_qparams(kc)
        q[f"wc{j}"], q[f"bc{j}"] = wq, bc
        swc.append(sw)
        kr, br = _kb(head_params["regression"], f"conv{j}")
        wq, sw = weight_qparams(kr)
        q[f"wr{j}"], q[f"br{j}"] = wq, br
        swr.append(sw)
    kc, bc = _kb(head_params["classification"], "out")
    q["wpc"], q["spc"] = weight_qparams(kc)
    q["bpc"] = bc
    kr, br = _kb(head_params["regression"], "out")
    q["wpr"], q["spr"] = weight_qparams(kr)
    q["bpr"] = br

    levels = []
    for i, s_lv in enumerate(level_scales):
        s_prev_c = s_prev_r = jnp.asarray(s_lv, jnp.float32)
        lv: Dict = {}
        for j in range(NUM_TOWER):
            s_c = act_scale(taps[f"L{i}.c{j}"])
            s_r = act_scale(taps[f"L{i}.r{j}"])
            lv[f"Ac{j}"] = s_prev_c * swc[j] / s_c
            lv[f"Bc{j}"] = q[f"bc{j}"] / s_c
            lv[f"Ar{j}"] = s_prev_r * swr[j] / s_r
            lv[f"Br{j}"] = q[f"br{j}"] / s_r
            s_prev_c, s_prev_r = s_c, s_r
        lv["Apc"] = s_prev_c * q["spc"]
        lv["Apr"] = s_prev_r * q["spr"]
        levels.append(lv)
    q["levels"] = levels
    return q


def retinahead_int8_forward(q, levels_q, num_anchors: int = 9,
                            num_classes: int = 20
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level int8 towers -> concatenated (loc [B,N,4], cls [B,N,C])
    matching RetinaNet.__call__'s output contract."""
    locs: List[jnp.ndarray] = []
    clss: List[jnp.ndarray] = []
    for i, x_q in enumerate(levels_q):
        lv = q["levels"][i]
        c = r = x_q
        for j in range(NUM_TOWER):
            zc = _conv_i8(c, q[f"wc{j}"], pad=1) * lv[f"Ac{j}"] + lv[f"Bc{j}"]
            c = _clip8(jnp.maximum(zc, 0.0))
            zr = _conv_i8(r, q[f"wr{j}"], pad=1) * lv[f"Ar{j}"] + lv[f"Br{j}"]
            r = _clip8(jnp.maximum(zr, 0.0))
        cls = _conv_i8(c, q["wpc"], pad=1) * lv["Apc"] + q["bpc"]
        loc = _conv_i8(r, q["wpr"], pad=1) * lv["Apr"] + q["bpr"]
        b = loc.shape[0]
        locs.append(loc.astype(jnp.float32).reshape(b, -1, 4))
        clss.append(cls.astype(jnp.float32).reshape(b, -1, num_classes))
    return jnp.concatenate(locs, axis=1), jnp.concatenate(clss, axis=1)


# ------------------------------------------------------------ full ladder


def quantize_retinanet(model, variables, calib_images, backend: str = "xla"):
    """PTQ the whole RetinaNet on a representative NORMALIZED batch.

    Returns {"backbone", "fpn", "head"} qtrees for
    :func:`retinanet_int8_forward`.
    """
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward
    from pytorch_object_detection_tpu.train.trainer import quantize_backbone

    q_bb = quantize_backbone(model, variables, calib_images)
    feats_q, feat_scales = jax.jit(
        lambda im: resnet50_int8_forward(q_bb, im, jnp.float32, dequant=False,
                                         backend=backend))(calib_images)
    feats = tuple(f.astype(jnp.float32) * s for f, s in zip(feats_q, feat_scales))
    taps = jax.jit(calibrate_retinafpn)(
        variables["params"]["fpn"], variables["batch_stats"]["fpn"], feats)
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    q_fpn = jax.jit(quantize_retinafpn)(
        variables["params"]["fpn"], variables["batch_stats"]["fpn"], taps,
        feat_scales)

    levels_q, level_scales = jax.jit(
        lambda fq: retinafpn_int8_forward(q_fpn, fq, dequant=False))(feats_q)
    levels = tuple(l.astype(jnp.float32) * s for l, s in zip(levels_q, level_scales))
    htaps = jax.jit(calibrate_retinahead)(variables["params"], levels)
    htaps = {k: float(v) for k, v in jax.device_get(htaps).items()}
    q_head = quantize_retinahead(variables["params"], htaps, level_scales)
    return {"backbone": q_bb, "fpn": q_fpn, "head": q_head}


def retinanet_int8_forward(model, qtree, images, backend: str = "xla"):
    """NORMALIZED images -> (loc, cls) through the full int8 ladder."""
    from pytorch_object_detection_tpu.nn.resnet_int8 import resnet50_int8_forward

    feats_q, _ = resnet50_int8_forward(
        qtree["backbone"], images, jnp.float32, dequant=False, backend=backend)
    levels_q, _ = retinafpn_int8_forward(qtree["fpn"], feats_q, dequant=False)
    return retinahead_int8_forward(
        qtree["head"], levels_q, model.num_anchors, model.num_classes)
