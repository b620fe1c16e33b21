"""int8 PTQ serving ladder for SSD300 (VGG-16 multibox) — the sixth and
last quantized model family.

The reference ships SSD300 as a crashing scaffold
(`/root/reference/model/od/ssd.py:29-138`); our float completion lives in
models/ssd.py.  This module extends the serving dtype ladder to it: every
conv in the VGG backbone (13 stage convs + dilated conv6 + conv7), the four
extra layers, and the six loc/conf head pairs run as int8 MXU convs with the
standard pre-folded f32 epilogue ``acc * A + B -> relu -> clip``
(scheme identical to models/fcos_int8.py / retinanet_int8.py: weights
per-out-channel, activations per-tensor abs-max calibrated per requant
point).  VGG has no norm layers, so there is nothing to fold — every requant
point is a plain conv+bias+ReLU.

Two SSD-specific moves:

* **Max pools stay int8.** max commutes with the monotone round/clip, so
  pool3's ceil-mode pad and pool5's 3x3/1 same-pad run directly on the int8
  tensors (pad value -127 = the domain minimum after ``_clip8``) — the same
  quantize-before-pool trick the ResNet stem uses (PERF.md).
* **L2Norm is scale-free.** conv4_3's channelwise L2 normalization
  ``x / ||x|| * gamma`` is invariant to the per-tensor int8 scale
  (``q*s / ||q*s|| == q / ||q||``), so it computes straight from the int8
  codes in f32 with NO dequantization, then requantizes for the level-0
  heads.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.models.head_int8 import _clip8
from pytorch_object_detection_tpu.models.ssd import NUM_ANCHORS
from pytorch_object_detection_tpu.ops.quant import act_scale, quantize_act, weight_qparams

# (name, pad, stride, dilation) in execution order; pools interleave per
# the VGG16 stage schedule (nn/vgg.py:33-44).
VGG_CONVS = (
    [(f"conv{s + 1}_{i + 1}", 1, 1, 1) for s, n in enumerate((2, 2, 3, 3, 3))
     for i in range(n)]
    + [("conv6", 6, 1, 6), ("conv7", 0, 1, 1)]
)
EXTRA_SPECS = (  # (scope, stride, pad) — ExtraLayer conv2 (models/ssd.py:81-97)
    ("extra1", 2, 1), ("extra2", 2, 1), ("extra3", 1, 0), ("extra4", 1, 0))


def _conv_i8(x_q, w_q, pad=0, stride=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)


def _maxpool_i8(x, window=2, stride=2, ceil=False, pad_same=False):
    """int8 max pool matching nn/vgg._maxpool's padding arithmetic."""
    if pad_same:  # pool5 3x3/1 'same'
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-127)
    elif ceil:
        h, w = x.shape[1:3]
        ph = (stride - h % stride) % stride
        pw = (stride - w % stride) % stride
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-127)
    return jax.lax.reduce_window(
        x, jnp.int8(-127), jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


def _kb(p) -> Tuple[jnp.ndarray, jnp.ndarray]:
    conv = p["conv"] if "conv" in p else p  # ExtraLayer conv2 is a bare nn.Conv
    k = conv["kernel"].astype(jnp.float32)
    b = (conv["bias"].astype(jnp.float32) if "bias" in conv
         else jnp.zeros((k.shape[-1],), jnp.float32))
    return k, b


def _conv_f(x, k, b, pad=0, stride=1, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _l2norm_f(x, gamma):
    return x / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + 1e-10) * gamma


def _pool_f(x, **kw):
    from pytorch_object_detection_tpu.nn.vgg import _maxpool

    return _maxpool(x, **kw)


def calibrate_ssd(params, images) -> Dict[str, jnp.ndarray]:
    """Float forward (mirrors models/ssd.SSD300.__call__) recording the
    abs-max at every requant point: the normalized input, each VGG/extra
    conv+ReLU output, and the L2Norm output."""
    p = params
    x = images.astype(jnp.float32)
    taps: Dict[str, jnp.ndarray] = {"input": jnp.max(jnp.abs(x))}

    conv4_3 = None
    for name, pad, stride, dil in VGG_CONVS:
        x = jax.nn.relu(_conv_f(x, *_kb(p["backbone"][name]), pad=pad,
                                stride=stride, dilation=dil))
        taps[name] = jnp.max(jnp.abs(x))
        if name == "conv4_3":
            conv4_3 = x
            x = _pool_f(x)
        elif name == "conv3_3":
            x = _pool_f(x, ceil=True)
        elif name in ("conv1_2", "conv2_2"):
            x = _pool_f(x)
        elif name == "conv5_3":
            x = _pool_f(x, window=3, stride=1, pad_same=True)

    f1 = _l2norm_f(conv4_3, p["l2norm"]["scale"].astype(jnp.float32))
    taps["f1"] = jnp.max(jnp.abs(f1))

    feat = x  # conv7 out
    for scope, stride, pad in EXTRA_SPECS:
        feat = jax.nn.relu(_conv_f(feat, *_kb(p[scope]["conv1"])))
        taps[f"{scope}.c1"] = jnp.max(jnp.abs(feat))
        feat = jax.nn.relu(_conv_f(feat, *_kb(p[scope]["conv2"]), pad=pad,
                                   stride=stride))
        taps[f"{scope}.c2"] = jnp.max(jnp.abs(feat))
    return taps


def quantize_ssd300(model, variables, calib_images) -> Dict:
    """PTQ the whole SSD300 on a representative NORMALIZED batch.

    Returns the qtree for :func:`ssd300_int8_forward`.
    """
    p = variables["params"]
    taps = jax.jit(calibrate_ssd)(p, calib_images)
    taps = {k: float(v) for k, v in jax.device_get(taps).items()}
    s = {k: act_scale(v) for k, v in taps.items()}

    def blk(kp, s_in, s_out, out_f32: bool = False):
        k, b = _kb(kp)
        wq, sw = weight_qparams(k)
        if out_f32:  # head conv: dequantized output, bias unscaled
            return dict(w=wq, A=s_in * sw, B=b)
        return dict(w=wq, A=s_in * sw / s_out, B=b / s_out)

    q: Dict = {"s_input": jnp.asarray(s["input"], jnp.float32),
               "l2_gamma": p["l2norm"]["scale"].astype(jnp.float32),
               "s_f1": jnp.asarray(s["f1"], jnp.float32)}
    s_prev = s["input"]
    for name, *_ in VGG_CONVS:
        q[name] = blk(p["backbone"][name], s_prev, s[name])
        s_prev = s[name]
    for scope, *_ in EXTRA_SPECS:
        q[f"{scope}.c1"] = blk(p[scope]["conv1"], s_prev, s[f"{scope}.c1"])
        q[f"{scope}.c2"] = blk(p[scope]["conv2"], s[f"{scope}.c1"],
                               s[f"{scope}.c2"])
        s_prev = s[f"{scope}.c2"]

    level_s = [s["f1"], s["conv7"], s["extra1.c2"], s["extra2.c2"],
               s["extra3.c2"], s["extra4.c2"]]
    for i, s_lv in enumerate(level_s):
        q[f"loc{i}"] = blk(p[f"loc{i}"], s_lv, None, out_f32=True)
        q[f"conf{i}"] = blk(p[f"conf{i}"], s_lv, None, out_f32=True)
    return jax.tree_util.tree_map(jnp.asarray, q)


def ssd300_int8_forward(model, qtree, images
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NORMALIZED images -> (loc [B,8732,4], conf [B,8732,C]) through the
    full int8 ladder (output contract of models/ssd.SSD300.__call__)."""
    q = qtree

    def rq(x_q, blk, pad=0, stride=1, dilation=1):
        acc = _conv_i8(x_q, blk["w"], pad=pad, stride=stride, dilation=dilation)
        return _clip8(jnp.maximum(acc * blk["A"] + blk["B"], 0.0))

    x = quantize_act(images, q["s_input"])
    conv4_3_q = None
    for name, pad, stride, dil in VGG_CONVS:
        x = rq(x, q[name], pad=pad, stride=stride, dilation=dil)
        if name == "conv4_3":
            conv4_3_q = x
            x = _maxpool_i8(x)
        elif name == "conv3_3":
            x = _maxpool_i8(x, ceil=True)
        elif name in ("conv1_2", "conv2_2"):
            x = _maxpool_i8(x)
        elif name == "conv5_3":
            x = _maxpool_i8(x, window=3, stride=1, pad_same=True)

    # L2Norm straight from the int8 codes (per-tensor scale cancels)
    c = conv4_3_q.astype(jnp.float32)
    f1 = _clip8(_l2norm_f(c, q["l2_gamma"]) / q["s_f1"])

    levels: List[jnp.ndarray] = [f1, x]  # x = conv7 out (f2); extras chain off it
    for scope, stride, pad in EXTRA_SPECS:
        y = rq(levels[-1], q[f"{scope}.c1"])
        levels.append(rq(y, q[f"{scope}.c2"], pad=pad, stride=stride))

    b = images.shape[0]
    locs, confs = [], []
    for i, (feat, na) in enumerate(zip(levels, NUM_ANCHORS)):
        loc = _conv_i8(feat, q[f"loc{i}"]["w"], pad=1)
        loc = loc * q[f"loc{i}"]["A"] + q[f"loc{i}"]["B"]
        conf = _conv_i8(feat, q[f"conf{i}"]["w"], pad=1)
        conf = conf * q[f"conf{i}"]["A"] + q[f"conf{i}"]["B"]
        locs.append(loc.reshape(b, -1, 4))
        confs.append(conf.reshape(b, -1, model.num_classes))
    return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)
