"""int8 PTQ inference forward for the ResNet-50 backbone.

Pure functions over the standard ``nn/resnet.ResNet50`` variables pytree —
BN is folded into conv weights, weights are quantized per-out-channel int8,
activations per-tensor int8 (abs-max calibration).  Every bottleneck conv
runs int8 x int8 -> int32 on the MXU; the dequant + bias + residual + ReLU +
requant chain is a single elementwise epilogue XLA fuses into the conv, so
the residual stream lives in HBM as int8.

Flow per bottleneck (block input x_q int8 at scale s_in):
  a1 = requant(conv(x_q, W1q) * s_in*sw1 + b1, relu, -> s_a1)
  a2 = requant(conv(a1, W2q) * s_a1*sw2 + b2, relu, -> s_a2)   (stride here)
  sc = x_q * s_in          (identity)  |  conv(x_q, Wdq)*s_in*swd + bd
  out_q = requant(conv(a2, W3q)*s_a2*sw3 + b3 + sc, relu, -> s_out)
All scale algebra is pre-folded at quantization time, so the epilogues are
one mul + add (+residual) + relu + round per conv.

The stem (7x7 on 3 channels) stays bf16 — 3 input channels underfill the
MXU regardless of dtype, and the input range is data-dependent.

Counterpart of the reference's fp32 eval forward
(`/root/reference/model/backbone/resnet50.py:9-65` + `test.py:198-223`),
redesigned for the TPU serving dtype ladder.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.nn.fused_resnet import _conv, _conv_bn_act, _fold_bn
from pytorch_object_detection_tpu.ops.quant import (
    INT8_MAX,
    act_scale,
    quantize_act,
    requantize,
    weight_qparams,
)

STAGE_SIZES = (3, 4, 6, 3)


def _block_scopes():
    for stage, blocks in enumerate(STAGE_SIZES):
        for b in range(blocks):
            yield f"layer{stage + 1}_{b}", stage, b


def _stem_bf16(params, stats, x, compute_dtype):
    mult, shift = _fold_bn(params["bn1"], stats["bn1"])
    x = _conv_bn_act(x.astype(compute_dtype), params["conv1"]["conv"]["kernel"].astype(compute_dtype), mult, shift, stride=2)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def calibrate_resnet50(variables, images, compute_dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Float forward recording the abs-max at every quantization point.

    Returns {tap_name: scalar} with taps 'stem_out', and per block
    '<scope>.a1' / '<scope>.a2' / '<scope>.out'.  Jit this and reduce with
    jnp.maximum across calibration batches.
    """
    params, stats = variables["params"], variables["batch_stats"]
    taps = {}
    x = _stem_bf16(params, stats, images, compute_dtype)
    taps["stem_out"] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    for scope, stage, b in _block_scopes():
        p, s = params[scope], stats[scope]
        stride = 2 if (b == 0 and stage > 0) else 1
        m1, s1 = _fold_bn(p["bn1"], s["bn1"])
        m2, s2 = _fold_bn(p["bn2"], s["bn2"])
        m3, s3 = _fold_bn(p["bn3"], s["bn3"])
        y = _conv_bn_act(x, p["conv1"]["conv"]["kernel"].astype(compute_dtype), m1, s1)
        taps[f"{scope}.a1"] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        y = _conv_bn_act(y, p["conv2"]["conv"]["kernel"].astype(compute_dtype), m2, s2, stride)
        taps[f"{scope}.a2"] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        if "downsample_conv" in p:
            md, sd = _fold_bn(p["downsample_bn"], s["downsample_bn"])
            shortcut = _conv_bn_act(
                x, p["downsample_conv"]["conv"]["kernel"].astype(compute_dtype), md, sd, stride, act=False
            )
        else:
            shortcut = x
        y = _conv_bn_act(y, p["conv3"]["conv"]["kernel"].astype(compute_dtype), m3, s3, act=False)
        x = jnp.maximum(y + shortcut, 0.0)
        taps[f"{scope}.out"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return taps


def quantize_stem_s2d(params, stats, mean, std, stem_absmax) -> Dict:
    """Exact uint8 stem quantization for the fused s2d stem kernel.

    Images are uint8, so ``x_f = (u/255 - mean)/std`` is a per-channel
    affine of u — it folds INTO the conv weights/bias with no input
    quantization at all (``u - 128`` is the int8 input).  BN folds per
    out-channel; the requant scale folds into the (relu-commuting)
    epilogue.  Returns {w [192,64] int8, A/B f32[64], pad int8[12], scale}.
    """
    from pytorch_object_detection_tpu.nn.resnet import s2d_stem_kernel

    mean = jnp.asarray(mean, jnp.float32).reshape(3)
    std = jnp.asarray(std, jnp.float32).reshape(3)
    mult, shift = _fold_bn(params["bn1"], stats["bn1"])
    w = params["conv1"]["conv"]["kernel"].astype(jnp.float32)  # [7,7,3,64]
    a_ch = 1.0 / (255.0 * std)  # x_f = u * a + b per input channel
    b_ch = -mean / std
    wn = w * a_ch[None, None, :, None]
    const = jnp.sum(w * b_ch[None, None, :, None], axis=(0, 1, 2))  # [64]
    weff = wn * mult  # BN fold (per out-channel)
    bias = mult * (128.0 * jnp.sum(wn, axis=(0, 1, 2)) + const) + shift
    # pad the input-channel dim 3 -> 4 BEFORE the s2d transform (the input
    # is padded the same way pre-s2d, so the XLA-side channel pad runs on
    # the cheap [B,512,512,3] layout and the s2d channel count is 16 —
    # Mosaic needs the 16-piece im2col concat to land on aligned lanes)
    weff4 = jnp.pad(weff, ((0, 0), (0, 0), (0, 1), (0, 0)))
    ks2d = s2d_stem_kernel(weff4)  # [4,4,16,64], exact; order (dy, dx, c4)
    wq, sw = weight_qparams(ks2d)
    # direct 7x7 form for the XLA-conv stem: s2d_stem_kernel is a linear
    # rearrangement (plus zero taps), so per-channel absmax — hence the
    # scale AND the rounded int8 values — are identical to ks2d's
    wq7, sw7 = weight_qparams(weff4)  # [7,7,4,64] int8
    s_out = act_scale(stem_absmax)
    inv = 1.0 / s_out
    pad3 = jnp.clip(jnp.round(255.0 * mean - 128.0), -128, 127).astype(jnp.int8)
    pad4 = jnp.pad(pad3, (0, 1))  # 4th (zero-weight) channel
    return {
        "w": wq.reshape(16 * 16, 64),
        "w7": wq7,
        "A": sw * inv,
        "B": bias * inv,
        "pad": jnp.tile(pad4, 4),  # v-domain border fill, (dy, dx, c4) order
        "pad4": pad4,  # per raw channel (the 7x7 form's border fill)
        "scale": s_out,
    }


def quantize_resnet50(variables, act_absmax: Dict, mean=None, std=None) -> Dict:
    """Fold BN, quantize weights, and pre-fold all scale algebra.

    act_absmax: the (batch-reduced) tap dict from :func:`calibrate_resnet50`.
    Returns the qtree consumed by :func:`resnet50_int8_forward`.  When
    ``mean``/``std`` (the input-normalize constants) are given, the qtree
    also carries the exact uint8 s2d stem (:func:`quantize_stem_s2d`) used
    by the ``u8_stem`` serving path.
    """
    params, stats = variables["params"], variables["batch_stats"]
    q = {"stem": {
        "kernel": params["conv1"]["conv"]["kernel"],
        "bn": (params["bn1"], stats["bn1"]),
    }}
    s_prev = act_scale(act_absmax["stem_out"])
    q["stem_scale"] = s_prev
    if mean is not None and std is not None:
        q["stem_s2d"] = quantize_stem_s2d(params, stats, mean, std,
                                          act_absmax["stem_out"])

    for scope, stage, b in _block_scopes():
        p, s = params[scope], stats[scope]
        blk = {}
        s_in = s_prev
        s_a1 = act_scale(act_absmax[f"{scope}.a1"])
        s_a2 = act_scale(act_absmax[f"{scope}.a2"])
        s_out = act_scale(act_absmax[f"{scope}.out"])

        def folded(conv_name, bn_name):
            m, sh = _fold_bn(p[bn_name], s[bn_name])
            w = p[conv_name]["conv"]["kernel"].astype(jnp.float32) * m  # per out-ch
            wq, sw = weight_qparams(w)
            return wq, sw, sh

        w1q, sw1, b1 = folded("conv1", "bn1")
        blk["w1"], blk["A1"], blk["B1"] = w1q, s_in * sw1 / s_a1, b1 / s_a1
        w2q, sw2, b2 = folded("conv2", "bn2")
        blk["w2"], blk["A2"], blk["B2"] = w2q, s_a1 * sw2 / s_a2, b2 / s_a2
        w3q, sw3, b3 = folded("conv3", "bn3")
        blk["w3"], blk["A3"], blk["B3"] = w3q, s_a2 * sw3 / s_out, b3 / s_out
        if "downsample_conv" in p:
            wdq, swd, bd = folded("downsample_conv", "downsample_bn")
            blk["wd"], blk["Ad"], blk["Bd"] = wdq, s_in * swd / s_out, bd / s_out
        else:
            blk["short_mul"] = s_in / s_out  # identity shortcut rescale
        blk["out_scale"] = s_out
        q[scope] = blk
        s_prev = s_out
    return q


def _stem_direct_i8_xla(st, u4, pool: bool = True):
    """Direct 7x7/2 XLA int8 stem on the raw [B, H, W, 4] uint8 image.

    Bit-identical to the s2d forms (the s2d rewrite is a linear
    rearrangement of the same quantized taps — same scales, same rounded
    weights, same padv borders) but runs on XLA's native int8 conv
    engine: 4.05 ms device at B=128/512^2 vs 10.6 for the fused Pallas
    s2d kernel + its input copies (PERF.md r3 stem A/B).  No s2d
    transform of the image exists at all.
    """
    v = (u4.astype(jnp.int16) - 128).astype(jnp.int8)
    b, h, w, c = v.shape
    pad = st["pad4"].reshape(1, 1, 1, c)
    prow = jnp.broadcast_to(pad, (b, 3, w, c)).astype(jnp.int8)
    vp = jnp.concatenate([prow, v, prow], axis=1)
    pcol = jnp.broadcast_to(pad, (b, h + 6, 3, c)).astype(jnp.int8)
    vp = jnp.concatenate([pcol, vp, pcol], axis=2)
    acc = jax.lax.conv_general_dilated(
        vp, st["w7"], (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    z = jnp.maximum(acc * st["A"] + st["B"], 0.0)
    x_q = jnp.clip(jnp.round(z), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    if not pool:
        return x_q
    return jax.lax.reduce_window(
        x_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _stem_s2d_i8_xla(st, xs_u8):
    """Per-op oracle for the fused s2d stem kernel (ops/pallas_qstem):
    u8 -> (u - 128) int8, padvec-padded 4x4/1 int8 conv + epilogue +
    int8 maxpool."""
    xs = (xs_u8.astype(jnp.int16) - 128).astype(jnp.int8)
    b, hs, ws, c = xs.shape
    pad = st["pad"].reshape(1, 1, 1, c)
    prow = jnp.broadcast_to(pad, (b, 1, ws, c)).astype(jnp.int8)
    xp = jnp.concatenate([prow, prow, xs, prow], axis=1)
    pcol = jnp.broadcast_to(pad, (b, hs + 3, 1, c)).astype(jnp.int8)
    xp = jnp.concatenate([pcol, pcol, xp, pcol], axis=2)
    acc = jax.lax.conv_general_dilated(
        xp, st["w"].reshape(4, 4, c, -1), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    z = jnp.maximum(acc * st["A"] + st["B"], 0.0)
    x_q = jnp.clip(jnp.round(z), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return jax.lax.reduce_window(
        x_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _qconv(x_q, w_q, stride=1):
    k = w_q.shape[0]
    pad = k // 2
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,  # int8 x int8 -> int32 on the MXU
    )
    return acc.astype(jnp.float32)


def resnet50_int8_forward(qtree, images, compute_dtype=jnp.bfloat16, backend: str = "xla",
                          fuse_strided: bool = False, dequant: bool = True,
                          u8_stem: bool = False):
    """(C3, C4, C5) in ``compute_dtype`` from an int8-quantized backbone.

    dequant=False instead returns ``((c3_q, c4_q, c5_q) int8, scales)`` for
    an int8-consuming FPN (nn/fpn_int8.py) — no f32 materialization at the
    backbone/FPN seam.

    u8_stem=True: ``images`` is the RAW uint8 batch [B,H,W,3] — the
    normalize affine is folded into the stem weights exactly
    (:func:`quantize_stem_s2d`) and the whole stem (conv+BN+ReLU+requant+
    maxpool) runs as one Pallas kernel (XLA oracle under backend='xla').

    backend='xla': plain XLA int8 convs (requant epilogues materialize the
    int32 accumulator in HBM — correct but bandwidth-bound).
    backend='pallas': per-conv fused Pallas kernels (ops/pallas_qconv) —
    epilogues (incl. the residual add) run in VMEM, HBM sees int8 only.
    backend='pallas_block': whole-bottleneck fusion (ops/pallas_qblock) for
    every stride-1 block — the block input is read once and the output
    written once; a1/a2/accumulators never leave VMEM.  Strided blocks use
    the per-conv kernels.  The stem stays on XLA in all modes.
    """
    pallas = backend in ("pallas", "pallas_block")
    fuse_blocks = backend == "pallas_block"
    if pallas:
        from pytorch_object_detection_tpu.ops.pallas_qconv import qconv1x1, qconv3x3
    if fuse_blocks:
        from pytorch_object_detection_tpu.ops.pallas_qblock import (
            qbottleneck,
            qbottleneck_s2,
        )

    stem = qtree["stem"]
    mult, shift = _fold_bn(*stem["bn"])
    x_merged = False  # row-pair lane-merged stage-1 chain (u8 stem pool)
    if u8_stem:
        from pytorch_object_detection_tpu.nn.resnet import space_to_depth

        st = qtree["stem_s2d"]
        # Input forms (fastest first — PERF.md r3 "stem s2d forms"):
        #   * [B, H/2, 2, W/2, 8] u8 — the SAME C-contiguous RGBX frame
        #     buffer described 5D (a zero-cost numpy view on the host).
        #     The jit arg layout then equals the Pallas stem's operand
        #     constraint, so NO relayout/pad/s2d op exists at all.
        #   * [B, H, W, 4] RGBX / [B, H, W, 3] RGB — device-side s2d
        #     (form picked by PODT_RAW_STEM below).
        if images.ndim == 5:
            u4 = None  # already the raw-form kernel view
        elif images.shape[-1] == 4:
            u4 = images
        else:
            u4 = jnp.pad(images, ((0, 0), (0, 0), (0, 0), (0, 1)),
                         constant_values=jnp.uint8(128))
        if pallas:
            import os as _os

            from pytorch_object_detection_tpu.ops.pallas_qstem import qstem_conv

            # s2d forms (all bit-identical; see PERF.md r3 "stem s2d copies"):
            #   slice  — row-major bitcast view + two outer-strided slices
            #            + one lane concat in XLA (the W-pair merge is FREE
            #            in row-major, only the row interleave moves data)
            #   kernel — the bitcast view goes straight into the Pallas
            #            stem and the row merge happens in VMEM
            #   transpose — the original 6D-transpose space_to_depth
            # Big canvases (COCO 448x704 s2d): the whole-image Pallas
            # window overflows VMEM (raw view 161 MB, s2d 80.7 MB double-
            # buffered) — qstem_conv now auto-BANDS its grid over rows
            # (halo blocks + carried pool seam, bit-identical), so the
            # raw 5D-view fast path works at every canvas.  r2 fell back
            # to the 6D-transpose s2d form here; PODT_STEM_BANDS=0
            # restores that for A/B.
            if (images.ndim == 5
                    and _os.environ.get("PODT_STEM_BANDS", "1") == "0"):
                _, h2, _, w2, _ = images.shape
                if h2 * 2 * w2 * 128 > 45 * 2**20:
                    b_ = images.shape[0]
                    u4 = images.reshape(b_, h2 * 2, w2 * 2, 4)
            # "xla7" (opt-in, measured NET NEGATIVE e2e): the direct 7x7/2
            # conv on XLA's native int8 conv engine.  Standalone it wins
            # big (4.05 ms vs 10.6 for the Pallas stem incl. copies), but
            # embedded in the pipeline XLA materializes the s32 acc to HBM
            # (2.1 GB -> clamp_convert 4.0 ms) plus ~6.4 ms of boundary
            # relayout copies the standalone probe never paid — e2e 1960
            # img/s vs 2127 for the Pallas stem (PERF.md r3).
            xla7 = (_os.environ.get("PODT_STEM_XLA7", "0") == "1"
                    and "w7" in st)  # older exported qtrees lack w7
            if xla7:
                if u4 is None:  # undo the 5D view (free, row-major)
                    b_, h2, _, w2, _ = images.shape
                    u4 = images.reshape(b_, h2 * 2, w2 * 2, 4)
                merged = (fuse_blocks and fuse_strided
                          and _os.environ.get("PODT_MERGED_S1", "1") == "1")
                from pytorch_object_detection_tpu.ops.pallas_pool import (
                    qmaxpool3x3s2,
                )

                x_q = _stem_direct_i8_xla(st, u4, pool=False)
                x_q = qmaxpool3x3s2(x_q, emit_merged=merged)
                x_merged = merged
            elif u4 is None:
                raw_stem, xs = True, images
            else:
                # measured at B=128 (PERF.md r3): transpose 1905 img/s e2e,
                # kernel 1850, slice 1589 — XLA's 6D transpose beats both
                # device-side alternatives (the kernel form pays a 5.2 ms
                # arg relayout, not kernel cost)
                stem_form = _os.environ.get("PODT_RAW_STEM", "transpose")
                raw_stem = stem_form == "kernel"
                b_, h_, w_, _ = u4.shape
                u4v = u4.reshape(b_, h_ // 2, 2, w_ // 2, 8)
                if raw_stem:
                    xs = u4v
                elif stem_form == "slice":
                    xs = jnp.concatenate([u4v[:, :, 0], u4v[:, :, 1]], axis=-1)
                else:
                    xs = space_to_depth(u4, 2)  # [B, H/2, W/2, 16] uint8

            if xla7:
                pass  # x_q / x_merged already computed above
            elif _os.environ.get("PODT_STEM_POOL", "1") == "1":
                # 3x3/2 maxpool fused into the kernel epilogue: the
                # full-res conv output never touches HBM (bit-identical).
                # With the merged stage-1 chain on, the pool also emits the
                # row-pair lane-merged layout the stage-1 kernels consume —
                # Mosaic rejects 64<->128-lane shape casts, so the layout
                # must be born in-kernel (no XLA relayout exists).
                merged = (fuse_blocks and fuse_strided
                          and _os.environ.get("PODT_MERGED_S1", "1") == "1")
                x_q = qstem_conv(xs, st["w"], st["A"], st["B"], st["pad"],
                                 pool=True, emit_merged=merged, raw=raw_stem)
                x_merged = merged
            else:
                x_q = qstem_conv(xs, st["w"], st["A"], st["B"], st["pad"],
                                 raw=raw_stem)
                x_q = jax.lax.reduce_window(
                    x_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    [(0, 0), (1, 1), (1, 1), (0, 0)],
                )
        else:
            if u4 is None:  # undo the 5D view for the per-op oracle
                b_, h2, _, w2, _ = images.shape
                u4 = images.reshape(b_, h2 * 2, w2 * 2, 4)
            x_q = _stem_s2d_i8_xla(st, space_to_depth(u4, 2))
    elif backend == "pallas_stem_tail":
        # experimental: measured SLOWER than XLA on v5e (the bf16 pair-reduce
        # pooling lowers to sub-lane shuffles; 28 ms/iter at B=64 vs 6.8 for
        # the unfused XLA tail) — kept for re-evaluation, not a default
        from pytorch_object_detection_tpu.ops.pallas_stem import stem_bn_pool_quant

        x = _conv(images.astype(compute_dtype), stem["kernel"].astype(compute_dtype),
                  stride=2)
        x_q = stem_bn_pool_quant(x, mult, shift, qtree["stem_scale"])
    elif pallas:
        # quantize BEFORE the maxpool: max commutes with the monotone
        # round/clip, so this is bit-identical but the pool reads int8
        # (4x less HBM than the bf16 pool) and BN+ReLU+quantize fuse into
        # one elementwise pass after the conv
        import os as _os

        if _os.environ.get("PODT_S2D_STEM"):
            # exact space-to-depth rewrite of the 7x7/2 stem (12 input
            # channels instead of 3 fill the MXU contraction better)
            from pytorch_object_detection_tpu.nn.resnet import s2d_stem_kernel, space_to_depth

            k = s2d_stem_kernel(stem["kernel"].astype(jnp.float32)).astype(compute_dtype)
            xs = space_to_depth(images.astype(compute_dtype), 2)
            x = jax.lax.conv_general_dilated(
                xs, k, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jnp.maximum(x * mult.astype(x.dtype) + shift.astype(x.dtype), 0)
        else:
            x = _conv_bn_act(images.astype(compute_dtype), stem["kernel"].astype(compute_dtype), mult, shift, stride=2)
        x_q = quantize_act(x, qtree["stem_scale"])
        x_q = jax.lax.reduce_window(
            x_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
    else:
        x = _conv_bn_act(images.astype(compute_dtype), stem["kernel"].astype(compute_dtype), mult, shift, stride=2)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        x_q = quantize_act(x, qtree["stem_scale"])

    import os as _os

    if (fuse_blocks and fuse_strided
            and _os.environ.get("PODT_QCHAIN", "0") == "1"):
        # chained-segment kernels: one pallas_call per backbone segment
        # ([layer1_0..layer2_3] -> C3, [layer3_*] -> C4, [layer4_*] -> C5);
        # intermediate block activations live in VMEM scratch and never
        # touch HBM (ops/pallas_qchain).  plan_chains splits a segment
        # when the canvas makes it overflow VMEM (COCO 896x1408).
        from pytorch_object_detection_tpu.ops.pallas_qchain import (
            plan_chains,
            qchain,
        )

        def _blkdict(scope, kind, merged):
            blk = qtree[scope]
            cw = blk["w1"].shape[-1]
            d = dict(
                kind=kind, merged=merged,
                w1=blk["w1"].reshape(-1, cw), w2=blk["w2"],
                w3=blk["w3"].reshape(cw, -1),
                A1=blk["A1"], B1=blk["B1"], A2=blk["A2"], B2=blk["B2"],
                A3=blk["A3"], B3=blk["B3"],
            )
            if "wd" in blk:
                d.update(wd=blk["wd"].reshape(blk["wd"].shape[-2:]),
                         Ad=blk["Ad"], Bd=blk["Bd"])
            else:
                d["short_mul"] = blk["short_mul"]
            return d

        segs = [
            [("layer1_%d" % i, "s1") for i in range(3)]
            + [("layer2_0", "s2")]
            + [("layer2_%d" % i, "s1") for i in range(1, 4)],
            [("layer3_0", "s2")] + [("layer3_%d" % i, "s1") for i in range(1, 6)],
            [("layer4_0", "s2")] + [("layer4_%d" % i, "s1") for i in range(1, 3)],
        ]
        outputs = []
        cur, merged = x_q, x_merged
        for si, seg in enumerate(segs):
            blocks = []
            for scope, kind in seg:
                blocks.append(_blkdict(scope, kind, merged))
                if kind == "s2":
                    merged = False
            for idxs in plan_chains(cur.shape[1:], blocks):
                cur = qchain(cur, [blocks[i] for i in idxs])
            outputs.append((cur, qtree[seg[-1][0]]["out_scale"]))
        if not dequant:
            return tuple(q for q, _ in outputs), tuple(s for _, s in outputs)
        return tuple(
            (q.astype(jnp.float32) * s).astype(compute_dtype) for q, s in outputs
        )

    outputs = []
    for stage, blocks in enumerate(STAGE_SIZES):
        for b in range(blocks):
            blk = qtree[f"layer{stage + 1}_{b}"]
            stride = 2 if (b == 0 and stage > 0) else 1
            if fuse_blocks and (stride == 1 or fuse_strided):
                cw = blk["w1"].shape[-1]
                common = (
                    x_q, blk["w1"].reshape(-1, cw), blk["w2"], blk["w3"].reshape(cw, -1),
                )
                if stride == 1:
                    kw = dict(
                        wd=blk["wd"].reshape(blk["wd"].shape[-2:]), ad=blk["Ad"], bd=blk["Bd"],
                    ) if "wd" in blk else dict(short_mul=blk["short_mul"])
                    # row-pair lane-merged chain (stage 1): the 64-ch
                    # dots/epilogues otherwise run half-lane
                    x_q = qbottleneck(
                        *common,
                        blk["A1"], blk["B1"], blk["A2"], blk["B2"], blk["A3"], blk["B3"],
                        merged=x_merged,
                        **kw,
                    )
                else:
                    x_q = qbottleneck_s2(
                        *common[:4], blk["wd"].reshape(blk["wd"].shape[-2:]),
                        blk["A1"], blk["B1"], blk["A2"], blk["B2"], blk["A3"], blk["B3"],
                        blk["Ad"], blk["Bd"],
                        merged_in=x_merged,
                    )
                    x_merged = False  # stride-2 output is canonical
            elif pallas:
                a1 = qconv1x1(x_q, blk["w1"], blk["A1"], blk["B1"])
                if stride == 1:
                    a2 = qconv3x3(a1, blk["w2"], blk["A2"], blk["B2"])
                else:
                    a2 = requantize(_qconv(a1, blk["w2"], stride), blk["A2"], blk["B2"])
                if "wd" in blk:
                    x_sub = x_q[:, ::stride, ::stride, :] if stride > 1 else x_q
                    short_q = qconv1x1(x_sub, blk["wd"], blk["Ad"], blk["Bd"], relu=False)
                    x_q = qconv1x1(a2, blk["w3"], blk["A3"], blk["B3"],
                                   res_nhwc=short_q, res_scale=1.0)
                else:
                    x_q = qconv1x1(a2, blk["w3"], blk["A3"], blk["B3"],
                                   res_nhwc=x_q, res_scale=blk["short_mul"])
            else:
                a1 = requantize(_qconv(x_q, blk["w1"]), blk["A1"], blk["B1"])
                a2 = requantize(_qconv(a1, blk["w2"], stride), blk["A2"], blk["B2"])
                pre = _qconv(a2, blk["w3"]) * blk["A3"] + blk["B3"]
                if "wd" in blk:
                    short = _qconv(x_q, blk["wd"], stride) * blk["Ad"] + blk["Bd"]
                else:
                    short = x_q.astype(jnp.float32) * blk["short_mul"]
                y = jnp.maximum(pre + short, 0.0)
                x_q = jnp.clip(jnp.round(y), -INT8_MAX, INT8_MAX).astype(jnp.int8)
        outputs.append((x_q, qtree[f"layer{stage + 1}_{blocks - 1}"]["out_scale"]))

    if not dequant:
        return tuple(q for q, _ in outputs[-3:]), tuple(s for _, s in outputs[-3:])
    return tuple(
        (q.astype(jnp.float32) * s).astype(compute_dtype) for q, s in outputs[-3:]
    )
