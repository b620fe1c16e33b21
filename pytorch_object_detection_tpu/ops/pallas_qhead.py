"""Whole-HISHead-level fused int8 Pallas kernel (TPU) — GN computed on-chip.

One kernel maps one int8 pyramid level to (cls logits, cnt|reg preds):
pw1 -> GN32+ReLU -> dw3x3 -> GN32+SiLU -> pw2+residual -> cls/reg towers
(3x3 + GN32 + ReLU) -> pred convs — eleven VMEM-resident passes, one HBM
read (int8 level) and two small bf16 writes (the packed pred maps).

GroupNorm without leaving the kernel: each conv pass accumulates per-channel
sum/sum-of-squares from its f32 accumulator while storing the (bf16)
pre-norm tensor to VMEM scratch; group reduce/broadcast run as two tiny f32
matmuls against a 0/1 group-membership matrix (exact, no cross-lane shuffle
semantics to worry about), then a second pass applies
``(z - mean) * rstd * gamma + beta``, the activation, and the int8 requant.

This succeeds where the bf16 whole-head kernel failed (PERF.md r1: im2col
build was the VPU wall): the 3x3 convs here are nine shifted int8 MXU dots
on VMEM-resident tensors (the proven ops/pallas_qblock pattern), not
materialized windows.

Epilogue algebra identical to models/head_int8._hishead_level_i8_xla, with
two documented numerical deltas (both inside the test tolerance band):
GN sums/sums-of-squares accumulate from the f32 conv accumulator while the
normalize pass reads the bf16-rounded scratch tensor, and variance uses the
E[x^2] - mean^2 form in f32 over the whole level (the oracle computes
(x - mean)^2 in two passes).  Both introduce sub-LSB deltas covered by the
1-LSB propagation tolerance in tests/test_quant.py.
Reference: model/od/HISFcos.py:182-229.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_object_detection_tpu.ops.pallas_qhis import _band, _shift_cols

GN_EPS = 1e-5
NUM_GROUPS = 32


def _pred_pad_for(num_classes: int) -> int:
    """Lane-friendly pad for the packed pred maps: both the cls map
    (num_classes ch) and the cnt|reg map (5 ch) round up to a multiple of
    32 sublanes — 32 for VOC (20 cls), 96 for COCO (80 cls)."""
    n = max(int(num_classes), 5)
    return -(-n // 32) * 32


def _dot_i8(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _clip8(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _gn_vectors(ch_sum, ch_sumsq, g_ref, gamma, beta, npix, gsz):
    """Per-channel (mult, shift) from accumulated channel stats.

    g_ref: [nch, 32] 0/1 membership.  mean/var per (group) over
    npix * gsz elements; flax GroupNorm biased-variance semantics.
    """
    n = float(npix * gsz)
    g_sum = _dot_f32(ch_sum, g_ref[:])        # [1, 32]
    g_sumsq = _dot_f32(ch_sumsq, g_ref[:])    # [1, 32]
    mean_g = g_sum / n
    var_g = g_sumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + GN_EPS)
    # broadcast back to channels: [1,32] x [nch,32]^T
    bcast = lambda v: jax.lax.dot_general(
        v, g_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, nch]
    mult = bcast(rstd_g) * gamma
    shift = beta - bcast(mean_g * rstd_g) * gamma
    return mult, shift


def _qhead_kernel(x_ref, w1_ref, wdw_ref, w2_ref, wc_ref, wr_ref, wpc_ref,
                  wcr_ref, g1_ref, g2_ref, gn_ref, sc_ref, sm_ref,
                  cls_ref, cr_ref, z_s, zt_s, x1q_s, x2q_s, yq_s, tq_s, *,
                  height, width, cin, row_chunk, pred_pad):
    c2 = 2 * cin
    npix = height * width
    a1r = sc_ref[0, :]          # [2C]
    adw = sc_ref[1, :]
    a2r, b2r = sc_ref[2, :cin], sc_ref[3, :cin]
    acr_t = sc_ref[4, :cin]     # cls tower Ac
    arr_t = sc_ref[5, :cin]     # reg tower Ar
    apc, bpc = sc_ref[6, :pred_pad], sc_ref[7, :pred_pad]
    acr_p, bcr_p = sc_ref[8, :pred_pad], sc_ref[9, :pred_pad]
    gamma1, beta1 = gn_ref[0, :], gn_ref[1, :]
    gamma2, beta2 = gn_ref[2, :], gn_ref[3, :]
    gammac, betac = gn_ref[4, :cin], gn_ref[5, :cin]
    gammar, betar = gn_ref[6, :cin], gn_ref[7, :cin]
    inv_x1, inv_x2 = sm_ref[0, 0], sm_ref[0, 1]
    res_mul = sm_ref[0, 2]
    inv_c, inv_r = sm_ref[0, 3], sm_ref[0, 4]

    x_img = x_ref[0]  # [H, W, C] int8

    def ch_sums(z2d):
        """Per-channel sum and sum-of-squares (VPU reduce; MXU ones-dot
        variants measured neutral-to-slower with the int8 dw path)."""
        return (jnp.sum(z2d, axis=0, keepdims=True),
                jnp.sum(z2d * z2d, axis=0, keepdims=True))

    # ---- pw1 + stats
    s1 = jnp.zeros((1, c2), jnp.float32)
    ss1 = jnp.zeros((1, c2), jnp.float32)
    for r0 in range(0, height, row_chunk):
        xs = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        z = _dot_i8(xs, w1_ref[:]).astype(jnp.float32) * a1r
        ds, dss = ch_sums(z)
        s1, ss1 = s1 + ds, ss1 + dss
        z_s[r0:r0 + row_chunk] = z.reshape(row_chunk, width, c2).astype(jnp.bfloat16)
    # gamma1/beta1 arrive pre-scaled by inv_x1 (relu commutes with the
    # positive requant scale), so normalize+requant is one fma + relu + clip
    mult, shift = _gn_vectors(s1, ss1, g2_ref, gamma1, beta1, npix, c2 // NUM_GROUPS)
    for r0 in range(0, height, row_chunk):
        z = z_s[r0:r0 + row_chunk].astype(jnp.float32)
        x1q_s[r0:r0 + row_chunk] = _clip8(jnp.maximum(z * mult + shift, 0.0))

    # ---- dw 3x3 (int8 VPU — bf16 variant measured ~1.4 ms SLOWER) + GN + SiLU
    s2 = jnp.zeros((1, c2), jnp.float32)
    ss2 = jnp.zeros((1, c2), jnp.float32)
    for r0 in range(0, height, row_chunk):
        band = _band(x1q_s, r0, row_chunk, height, width, c2, 1)
        acc = jnp.zeros((row_chunk, width, c2), jnp.int32)
        for ky in range(3):
            rows = band[ky:ky + row_chunk]
            for kx in range(3):
                win = _shift_cols(rows, kx, 1, width, c2)
                acc = acc + win.astype(jnp.int32) * wdw_ref[3 * ky + kx, :].astype(jnp.int32)
        z = acc.astype(jnp.float32) * adw
        ds, dss = ch_sums(z.reshape(row_chunk * width, c2))
        s2, ss2 = s2 + ds, ss2 + dss
        z_s[r0:r0 + row_chunk] = z.astype(jnp.bfloat16)
    mult, shift = _gn_vectors(s2, ss2, g2_ref, gamma2, beta2, npix, c2 // NUM_GROUPS)
    for r0 in range(0, height, row_chunk):
        z = z_s[r0:r0 + row_chunk].astype(jnp.float32)
        x2 = _silu(z * mult + shift)
        x2q_s[r0:r0 + row_chunk] = _clip8(x2 * inv_x2)

    # ---- pw2 + residual
    for r0 in range(0, height, row_chunk):
        xs = x2q_s[r0:r0 + row_chunk].reshape(row_chunk * width, c2)
        y = _dot_i8(xs, w2_ref[:]).astype(jnp.float32) * a2r + b2r
        res = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        y = y + res.astype(jnp.float32) * res_mul
        yq_s[r0:r0 + row_chunk] = _clip8(y).reshape(row_chunk, width, cin)

    # ---- cls/reg branches: tower 3x3 + GN + ReLU -> pred 3x3
    for (w_t, a_t, gmm, bt, inv_t, w_p, a_p, b_p, out_ref) in (
        (wc_ref, acr_t, gammac, betac, inv_c, wpc_ref, apc, bpc, cls_ref),
        (wr_ref, arr_t, gammar, betar, inv_r, wcr_ref, acr_p, bcr_p, cr_ref),
    ):
        st = jnp.zeros((1, cin), jnp.float32)
        sst = jnp.zeros((1, cin), jnp.float32)
        for r0 in range(0, height, row_chunk):
            band = _band(yq_s, r0, row_chunk, height, width, cin, 1)
            acc = jnp.zeros((row_chunk * width, cin), jnp.int32)
            for ky in range(3):
                rows = band[ky:ky + row_chunk]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, width, cin)
                    acc = acc + _dot_i8(win.reshape(row_chunk * width, cin), w_t[ky, kx])
            z = acc.astype(jnp.float32) * a_t
            st = st + jnp.sum(z, axis=0, keepdims=True)
            sst = sst + jnp.sum(z * z, axis=0, keepdims=True)
            zt_s[r0:r0 + row_chunk] = z.reshape(row_chunk, width, cin).astype(jnp.bfloat16)
        # gmm/bt pre-scaled by inv_t (see gamma1 note)
        mult, shift = _gn_vectors(st, sst, g1_ref, gmm, bt, npix, cin // NUM_GROUPS)
        for r0 in range(0, height, row_chunk):
            z = zt_s[r0:r0 + row_chunk].astype(jnp.float32)
            tq_s[r0:r0 + row_chunk] = _clip8(jnp.maximum(z * mult + shift, 0.0))
        for r0 in range(0, height, row_chunk):
            band = _band(tq_s, r0, row_chunk, height, width, cin, 1)
            acc = jnp.zeros((row_chunk * width, pred_pad), jnp.int32)
            for ky in range(3):
                rows = band[ky:ky + row_chunk]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, width, cin)
                    acc = acc + _dot_i8(win.reshape(row_chunk * width, cin), w_p[ky, kx])
            out = acc.astype(jnp.float32) * a_p + b_p
            out_ref[0, r0:r0 + row_chunk] = out.reshape(
                row_chunk, width, pred_pad
            ).astype(jnp.bfloat16)


def _pad_pred(w_q, a, b, pred_pad):
    """Pad pred conv [3,3,C,n] (+ its epilogue vectors) to pred_pad lanes."""
    n = w_q.shape[-1]
    pad = pred_pad - n
    w_q = jnp.pad(w_q, ((0, 0), (0, 0), (0, 0), (0, pad)))
    a = jnp.pad(a.astype(jnp.float32).reshape(-1), (0, pad))
    b = jnp.pad(b.astype(jnp.float32).reshape(-1), (0, pad))
    return w_q, a, b


def qhishead_level(q, lv, x_q, *, num_classes: int | None = None,
                   row_chunk: int = 16, interpret: bool = False):
    """One pyramid level through the fused int8 head.

    q/lv: shared + per-level trees from models/head_int8.quantize_hishead.
    Returns (cls [B,H,W,num_classes] bf16, cr [B,H,W,5] bf16) where cr is
    [cnt, reg*4] pre-ScaleExp.
    """
    from pytorch_object_detection_tpu.ops.pallas_qhis import pick_row_chunk

    bsz, h, w, cin = x_q.shape
    c2 = 2 * cin
    nc = int(num_classes) if num_classes is not None else int(q["num_classes"])
    pred_pad = _pred_pad_for(nc)
    assert pred_pad <= c2, (nc, c2)  # epilogue rows are [*, 2C]
    row_chunk = pick_row_chunk(h, row_chunk)

    wpc, apc, bpc = _pad_pred(q["wpc"], lv["Apc"], q["bpc"], pred_pad)
    wcr, acr, bcr = _pad_pred(q["wcr"], lv["Acr"], q["bcr"], pred_pad)

    def row(v, n=c2):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, n - v.shape[0]))

    scales = jnp.stack([
        row(lv["A1"]), row(lv["Adw"]), row(lv["A2"]), row(lv["B2"]),
        row(lv["Ac"]), row(lv["Ar"]),
        row(apc), row(bpc), row(acr), row(bcr),
    ])  # [10, 2C]
    gn = jnp.stack([
        row(q["gn1"][0] * lv["inv_x1"]), row(q["gn1"][1] * lv["inv_x1"]),
        row(q["gn2"][0]), row(q["gn2"][1]),  # silu: scale can't fold through
        row(q["gnc"][0] * lv["inv_c"]), row(q["gnc"][1] * lv["inv_c"]),
        row(q["gnr"][0] * lv["inv_r"]), row(q["gnr"][1] * lv["inv_r"]),
    ])  # [8, 2C] — relu-GN gammas/betas pre-scaled by their requant scales
    sm = jnp.stack([
        jnp.asarray(lv["inv_x1"], jnp.float32),
        jnp.asarray(lv["inv_x2"], jnp.float32),
        jnp.asarray(lv["res_mul"], jnp.float32),
        jnp.asarray(lv["inv_c"], jnp.float32),
        jnp.asarray(lv["inv_r"], jnp.float32),
        jnp.float32(0.0),
    ]).reshape(1, 6)

    def member(nch):
        ch = jnp.arange(nch)[:, None]
        return (ch // (nch // NUM_GROUPS) == jnp.arange(NUM_GROUPS)[None, :]).astype(
            jnp.float32
        )

    w1 = q["w1"].reshape(cin, c2)
    wdw = q["wdw"].reshape(9, c2)
    w2 = q["w2"].reshape(c2, cin)

    kern = functools.partial(
        _qhead_kernel, height=h, width=w, cin=cin, row_chunk=row_chunk,
        pred_pad=pred_pad,
    )
    whole = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    flops = 2 * bsz * h * w * (
        cin * c2 * 2 + 9 * c2 + 9 * cin * cin * 2 + 9 * cin * pred_pad * 2
    )
    cls, cr = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            whole(cin, c2), whole(9, c2), whole(c2, cin),
            whole(3, 3, cin, cin), whole(3, 3, cin, cin),
            whole(3, 3, cin, pred_pad), whole(3, 3, cin, pred_pad),
            whole(cin, NUM_GROUPS), whole(c2, NUM_GROUPS),
            whole(8, c2), whole(10, c2),
            pl.BlockSpec((1, 6), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, pred_pad), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, pred_pad), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, pred_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, h, w, pred_pad), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, w, c2), jnp.bfloat16),   # z_s (pw1 / dw pre-norm)
            pltpu.VMEM((h, w, cin), jnp.bfloat16),  # zt_s (tower pre-norm)
            pltpu.VMEM((h, w, c2), jnp.int8),       # x1q
            pltpu.VMEM((h, w, c2), jnp.int8),       # x2q
            pltpu.VMEM((h, w, cin), jnp.int8),      # yq
            pltpu.VMEM((h, w, cin), jnp.int8),      # tq (cls then reg tower)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bsz * h * w * (cin + 4 * pred_pad),
            transcendentals=bsz * h * w * c2,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x_q, w1, wdw, w2, q["wc"], q["wr"], wpc, wcr,
      member(cin), member(c2), gn, scales, sm)
    return cls[..., :nc], cr[..., :5]
