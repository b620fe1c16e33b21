"""Whole-HISHead-level fused int8 Pallas kernel (TPU) — GN computed on-chip.

One kernel maps one int8 pyramid level to (cls logits, cnt|reg preds):
pw1 -> GN32+ReLU -> dw3x3 -> GN32+SiLU -> pw2+residual -> cls/reg towers
(3x3 + GN32 + ReLU) -> pred convs — SEVEN VMEM-resident passes, one HBM
read (int8 level) and two small bf16 writes (the packed pred maps).

GroupNorm without leaving the kernel: each conv pass accumulates per-channel
sum/sum-of-squares from its f32 accumulator while storing the (bf16)
pre-norm tensor to VMEM scratch; group reduce/broadcast run as two tiny f32
matmuls against a 0/1 group-membership matrix (exact, no cross-lane shuffle
semantics to worry about).  The normalize ``(z - mean) * rstd * gamma +
beta`` + activation + requant is FUSED into the conv pass that consumes it
(r3): 3x3 consumers rebuild their one-row halo from the pre-norm scratch
(`_norm_relu_band`, 2/row_chunk recompute overhead), the 1x1 consumer
normalizes inline — no standalone elementwise pass ever walks the level.

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

# dev ablation knob (read at trace time): "nosilu" replaces the stem SiLU
# with ReLU, "nostats" skips the GN stat accumulation, "nodw" skips the
# depthwise taps, "skeleton" strips ALL epilogue VPU work (stats, normalize
# FMAs, SiLU — leaves the MXU dots + band plumbing + stores: the structural
# floor of this kernel design) — for attributing VPU cost, never accuracy
import os as _os

_ABL = _os.environ.get("PODT_QHEAD_ABL", "")


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


def _norm_relu_band(src_s, r0, rc, height, width, ch, mult, shift):
    """Normalized+ReLU'd+requantized int8 band rows [r0-1, r0+rc+1) built
    ON THE FLY from the bf16 pre-norm scratch (fused-normalize form: the
    standalone normalize pass disappears; halo rows are recomputed, a
    2/rc overhead).  Edge rows are zero AFTER the normalize — the conv's
    zero-pad lives in the normalized int8 domain."""
    lo, hi = r0 - 1, r0 + rc + 1
    clo, chi = max(lo, 0), min(hi, height)
    z = src_s[clo:chi].astype(jnp.float32)
    if _ABL == "skeleton":
        q = _clip8(z)
    else:
        q = _clip8(jnp.maximum(z * mult + shift, 0.0))
    zrow = jnp.zeros((1, width, ch), jnp.int8)
    for _ in range(clo - lo):
        q = jnp.concatenate([zrow, q], axis=0)
    for _ in range(hi - chi):
        q = jnp.concatenate([q, zrow], axis=0)
    return q  # [rc + 2, W, C] int8


def _qhead_kernel(x_ref, w1_ref, wdw_ref, w2_ref, wc_ref, wr_ref, wpc_ref,
                  wcr_ref, g1_ref, g2_ref, gn_ref, sc_ref, sm_ref,
                  cls_ref, cr_ref, z1_s, z2_s, zt_s, yq_s, *,
                  height, width, cin, row_chunk, pred_pad):
    """Seven fused passes (was eleven): every GN normalize rides inside
    the conv pass that consumes it — the 3x3 consumers re-normalize their
    one-row halo from the bf16 pre-norm scratch (_norm_relu_band), the
    1x1 consumer (pw2) normalizes inline.  This removes four standalone
    whole-level VPU passes (and three int8 scratch tensors) and lets
    Mosaic co-schedule the normalize VPU work with the MXU dots of the
    same pass."""
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
    inv_x2 = sm_ref[0, 1]
    res_mul = sm_ref[0, 2]

    x_img = x_ref[0]  # [H, W, C] int8

    def ch_sums(z2d):
        """Per-channel sum and sum-of-squares (VPU reduce; MXU ones-dot
        variants measured neutral-to-slower with the int8 dw path)."""
        if _ABL in ("nostats", "skeleton"):
            z = jnp.zeros((1, z2d.shape[1]), jnp.float32)
            return z, z + 1.0
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
        z1_s[r0:r0 + row_chunk] = z.reshape(row_chunk, width, c2).astype(jnp.bfloat16)
    # gamma1/beta1 arrive pre-scaled by inv_x1 (relu commutes with the
    # positive requant scale), so normalize+requant is one fma + relu + clip
    mult1, shift1 = _gn_vectors(s1, ss1, g2_ref, gamma1, beta1, npix, c2 // NUM_GROUPS)

    # ---- dw 3x3 (int8 VPU — bf16 variant measured ~1.4 ms SLOWER), the
    # normalize-1 fused into the band build
    s2 = jnp.zeros((1, c2), jnp.float32)
    ss2 = jnp.zeros((1, c2), jnp.float32)
    for r0 in range(0, height, row_chunk):
        band = _norm_relu_band(z1_s, r0, row_chunk, height, width, c2, mult1, shift1)
        acc = jnp.zeros((row_chunk, width, c2), jnp.int32)
        for ky in range(3):
            rows = band[ky:ky + row_chunk]
            for kx in range(3):
                win = _shift_cols(rows, kx, 1, width, c2)
                if _ABL != "nodw":
                    acc = acc + win.astype(jnp.int32) * wdw_ref[3 * ky + kx, :].astype(jnp.int32)
        z = acc.astype(jnp.float32) * adw
        ds, dss = ch_sums(z.reshape(row_chunk * width, c2))
        s2, ss2 = s2 + ds, ss2 + dss
        z2_s[r0:r0 + row_chunk] = z.astype(jnp.bfloat16)
    mult2, shift2 = _gn_vectors(s2, ss2, g2_ref, gamma2, beta2, npix, c2 // NUM_GROUPS)

    # ---- normalize-2 + SiLU + pw2 + residual in ONE pass (1x1: no halo)
    for r0 in range(0, height, row_chunk):
        z = z2_s[r0:r0 + row_chunk].astype(jnp.float32)
        if _ABL == "skeleton":
            x2 = z
        elif _ABL == "nosilu":
            x2 = jnp.maximum(z * mult2 + shift2, 0.0)
        else:
            x2 = _silu(z * mult2 + shift2)
        xs = _clip8(x2 * inv_x2).reshape(row_chunk * width, c2)
        y = _dot_i8(xs, w2_ref[:]).astype(jnp.float32) * a2r + b2r
        res = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        y = y + res.astype(jnp.float32) * res_mul
        yq_s[r0:r0 + row_chunk] = _clip8(y).reshape(row_chunk, width, cin)

    # ---- cls/reg branches: tower 3x3 + GN stats, then pred 3x3 with the
    # tower normalize fused into its band build
    for (w_t, a_t, gmm, bt, w_p, a_p, b_p, out_ref) in (
        (wc_ref, acr_t, gammac, betac, wpc_ref, apc, bpc, cls_ref),
        (wr_ref, arr_t, gammar, betar, wcr_ref, acr_p, bcr_p, cr_ref),
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
            if _ABL not in ("nostats", "skeleton"):
                st = st + jnp.sum(z, axis=0, keepdims=True)
                sst = sst + jnp.sum(z * z, axis=0, keepdims=True)
            zt_s[r0:r0 + row_chunk] = z.reshape(row_chunk, width, cin).astype(jnp.bfloat16)
        # gmm/bt pre-scaled by inv_t (see gamma1 note)
        multt, shiftt = _gn_vectors(st, sst, g1_ref, gmm, bt, npix, cin // NUM_GROUPS)
        for r0 in range(0, height, row_chunk):
            band = _norm_relu_band(zt_s, r0, row_chunk, height, width, cin,
                                   multt, shiftt)
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
            pltpu.VMEM((h, w, c2), jnp.bfloat16),   # z1_s (pw1 pre-norm)
            pltpu.VMEM((h, w, c2), jnp.bfloat16),   # z2_s (dw pre-norm)
            pltpu.VMEM((h, w, cin), jnp.bfloat16),  # zt_s (tower pre-norm)
            pltpu.VMEM((h, w, cin), jnp.int8),      # yq (stem output)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bsz * h * w * (cin + 4 * pred_pad),
            transcendentals=bsz * h * w * c2,
        ),
        # 124 MB of the v5e's 128 MB VMEM: COCO-canvas levels need >100
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x_q, w1, wdw, w2, q["wc"], q["wr"], wpc, wcr,
      member(cin), member(c2), gn, scales, sm)
    return cls[..., :nc], cr[..., :5]
