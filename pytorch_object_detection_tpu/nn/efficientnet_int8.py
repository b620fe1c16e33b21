"""int8 PTQ serving ladder for the EfficientNet-V1 backbone.

Extends the serving dtype ladder (nn/resnet_int8.py, models/fcos_int8.py)
to the EfficientNet backbone of the classic FCOS (BASELINE config 4 — the
variant that exercises depthwise convs; reference
``model/backbone/efficientnetv1.py:11-26`` + ``model/od/Fcos.py:31-32``).

Scheme (same as the ResNet/FPN ladders):
  * the stem (3x3/2 conv on 3 channels) stays bf16/f32 — 3 input channels
    underfill the MXU regardless of dtype and the input range is
    data-dependent; the stem output is the first quantization point;
  * every MBConv conv runs int8 x int8 -> int32: the 1x1 expand/project on
    the MXU, the depthwise kxk via XLA's grouped conv (the TPU handles
    int8 depthwise on the VPU);
  * BN folds into conv weights per out-channel; the dequant + bias + swish
    + requant chain is one elementwise epilogue XLA fuses into the conv;
  * SE runs in f32 on the dequantized dw activation (two 1x1 convs over a
    [B,1,1,C] vector — negligible), and the gate multiply rides the same
    epilogue as the requant;
  * residual adds use the exact scale algebra (x_q * s_in in f32);
  * activations are per-tensor abs-max calibrated at every requant point:
    post-expand-swish, post-dw-swish-SE, block output.

Endpoint contract matches ``nn/efficientnet.EfficientNet``: the returned
(C3, C4, C5) int8 feature maps + scales feed the classic-FPN int8 ladder
(models/fcos_int8.py) unchanged.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.efficientnet import (
    _B0_BLOCKS,
    _round_filters,
    _round_repeats,
)
from pytorch_object_detection_tpu.nn.fused_resnet import _fold_bn
from pytorch_object_detection_tpu.ops.quant import act_scale, weight_qparams


def _clip8(x):
    return jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def block_meta(width_mult: float = 1.0, depth_mult: float = 1.0) -> List[Dict]:
    """Static per-block structure mirroring ``EfficientNet.__call__``'s
    loop: name, stride, kernel, expand ratio, and whether the PREVIOUS
    block's output is a pyramid endpoint."""
    meta: List[Dict] = []
    block_id = 0
    for expand, ch, repeats, stride, kernel in _B0_BLOCKS:
        for r in range(_round_repeats(repeats, depth_mult)):
            s = stride if r == 0 else 1
            meta.append(dict(
                name=f"block{block_id}", stride=s, kernel=kernel,
                expand=expand, endpoint_before=(s == 2),
            ))
            block_id += 1
    return meta


def _conv_pw_f(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_dw_f(x, k, stride):
    kk = k.shape[0]
    pad = (kk - 1) // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _conv_pw_i8(x_q, w_q):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _conv_dw_i8(x_q, w_q, stride):
    kk = w_q.shape[0]
    pad = (kk - 1) // 2
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x_q.shape[-1],
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _se_gate(y_f, p_se):
    """f32 squeeze-excite gate of the (dequantized) dw activation
    (nn/layers.SEBlock; reference modules.py:107-121)."""
    g = jnp.mean(y_f, axis=(1, 2), keepdims=True)
    g = _conv_pw_f(g, p_se["fc1"]["conv"]["kernel"].astype(jnp.float32))
    g = _silu(g + p_se["fc1"]["conv"]["bias"].astype(jnp.float32))
    g = _conv_pw_f(g, p_se["fc2"]["conv"]["kernel"].astype(jnp.float32))
    g = jax.nn.sigmoid(g + p_se["fc2"]["conv"]["bias"].astype(jnp.float32))
    return g  # [B,1,1,C]


def _stem_f32(params, stats, x):
    mult, shift = _fold_bn(params["stem_bn"], stats["stem_bn"])
    k = params["stem_conv"]["conv"]["kernel"].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k * mult, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _silu(y + shift)


def calibrate_efficientnet(variables, images,
                           width_mult: float = 1.0, depth_mult: float = 1.0
                           ) -> Dict[str, jnp.ndarray]:
    """Float forward recording the abs-max at every quantization point:
    'stem', and per block '<name>.e' / '<name>.d' / '<name>.out'."""
    params, stats = variables["params"], variables["batch_stats"]
    taps: Dict[str, jnp.ndarray] = {}
    x = _stem_f32(params, stats, images)
    taps["stem"] = jnp.max(jnp.abs(x))
    for m in block_meta(width_mult, depth_mult):
        p, s = params[m["name"]], stats[m["name"]]
        y = x
        if m["expand"] != 1:
            me, se = _fold_bn(p["bn0"], s["bn0"])
            k = p["expand"]["conv"]["kernel"].astype(jnp.float32)
            y = _silu(_conv_pw_f(y, k * me) + se)
            taps[f"{m['name']}.e"] = jnp.max(jnp.abs(y))
        md, sd = _fold_bn(p["bn1"], s["bn1"])
        kd = p["dw"]["dw"]["conv"]["kernel"].astype(jnp.float32)
        y = _silu(_conv_dw_f(y, kd * md, m["stride"]) + sd)
        y = y * _se_gate(y, p["se"])
        taps[f"{m['name']}.d"] = jnp.max(jnp.abs(y))
        mp, sp = _fold_bn(p["bn2"], s["bn2"])
        kp = p["project"]["conv"]["kernel"].astype(jnp.float32)
        y = _conv_pw_f(y, kp * mp) + sp
        if m["stride"] == 1 and x.shape[-1] == y.shape[-1]:
            y = x + y
        taps[f"{m['name']}.out"] = jnp.max(jnp.abs(y))
        x = y
    return taps


def quantize_efficientnet(variables, taps: Dict[str, float],
                          width_mult: float = 1.0, depth_mult: float = 1.0
                          ) -> Dict:
    """Quantize MBConv weights + pre-fold every epilogue's scale algebra.

    Returns the qtree for :func:`efficientnet_int8_forward` (float stem
    params ride along — the stem stays bf16/f32).  The qtree holds ONLY
    arrays (jit-arg safe); the static block structure is recomputed from
    the width/depth multipliers by :func:`block_meta`."""
    params, stats = variables["params"], variables["batch_stats"]
    s_stem = act_scale(taps["stem"])
    q: Dict = {
        "stem": {
            "kernel": params["stem_conv"]["conv"]["kernel"].astype(jnp.float32),
            "bn": _fold_bn(params["stem_bn"], stats["stem_bn"]),
            "inv": 1.0 / s_stem,
        },
        "blocks": [],
    }
    s_x = s_stem
    for m in block_meta(width_mult, depth_mult):
        p, s = params[m["name"]], stats[m["name"]]
        blk: Dict = {}
        if m["expand"] != 1:
            me, se = _fold_bn(p["bn0"], s["bn0"])
            k = p["expand"]["conv"]["kernel"].astype(jnp.float32) * me
            wq, sw = weight_qparams(k)
            s_e = act_scale(taps[f"{m['name']}.e"])
            blk["expand"] = dict(w=wq, A=s_x * sw, B=se, inv=1.0 / s_e)
        else:
            s_e = s_x
        md, sd = _fold_bn(p["bn1"], s["bn1"])
        kd = p["dw"]["dw"]["conv"]["kernel"].astype(jnp.float32) * md
        wq, sw = weight_qparams(kd)  # [k,k,1,C]: per-channel on the last dim
        s_d = act_scale(taps[f"{m['name']}.d"])
        blk["dw"] = dict(w=wq, A=s_e * sw, B=sd, inv=1.0 / s_d)
        blk["se"] = jax.tree.map(lambda v: v.astype(jnp.float32), dict(p["se"]))
        mp, sp = _fold_bn(p["bn2"], s["bn2"])
        kp = p["project"]["conv"]["kernel"].astype(jnp.float32) * mp
        wq, sw = weight_qparams(kp)
        s_out = act_scale(taps[f"{m['name']}.out"])
        blk["project"] = dict(w=wq, A=s_d * sw, B=sp, inv=1.0 / s_out)
        blk["res_mul"] = jnp.asarray(s_x, jnp.float32)  # x_q dequant for residual
        blk["s_out"] = jnp.asarray(s_out, jnp.float32)
        q["blocks"].append(blk)
        s_x = s_out
    return q


def efficientnet_int8_forward(qtree, images, compute_dtype=jnp.bfloat16,
                              dequant: bool = True,
                              width_mult: float = 1.0, depth_mult: float = 1.0):
    """NHWC float images -> the last three pyramid endpoints (C3, C4, C5).

    ``dequant=True``: endpoints in ``compute_dtype``.  ``dequant=False``:
    ``([c3,c4,c5] int8, [s3,s4,s5] f32 scales)`` for the classic-FPN int8
    ladder."""
    st = qtree["stem"]
    mult, shift = st["bn"]
    y = jax.lax.conv_general_dilated(
        images.astype(jnp.float32), st["kernel"] * mult, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x_q = _clip8(_silu(y + shift) * st["inv"])

    endpoints: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    prev_scale = None  # always set: the block list is non-empty
    for m, blk in zip(block_meta(width_mult, depth_mult), qtree["blocks"]):
        if m["endpoint_before"]:
            endpoints.append((x_q, blk["res_mul"]))  # res_mul == s_in
        y_q = x_q
        if "expand" in blk:
            e = blk["expand"]
            y_q = _clip8(_silu(_conv_pw_i8(y_q, e["w"]) * e["A"] + e["B"]) * e["inv"])
        d = blk["dw"]
        y_f = _silu(_conv_dw_i8(y_q, d["w"], m["stride"]) * d["A"] + d["B"])
        y_f = y_f * _se_gate(y_f, blk["se"])
        y_q = _clip8(y_f * d["inv"])
        pr = blk["project"]
        y_f = _conv_pw_i8(y_q, pr["w"]) * pr["A"] + pr["B"]
        if m["stride"] == 1 and x_q.shape[-1] == pr["w"].shape[-1]:
            y_f = y_f + x_q.astype(jnp.float32) * blk["res_mul"]
        x_q = _clip8(y_f * pr["inv"])
        prev_scale = blk["s_out"]
    endpoints.append((x_q, prev_scale))

    feats_q = [e for e, _ in endpoints[-3:]]
    scales = [s for _, s in endpoints[-3:]]
    if not dequant:
        return feats_q, scales
    return [f.astype(jnp.float32).astype(compute_dtype) * jnp.asarray(s, compute_dtype)
            for f, s in zip(feats_q, scales)]
