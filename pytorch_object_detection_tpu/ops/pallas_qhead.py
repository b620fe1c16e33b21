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


# ---------------------------------------------------------------------------
# v2: image-pair phase-pipelined kernel (r5, VERDICT r4 #1 — the "new
# head-kernel design").
#
# Why: the v1 kernel's phases form a strict dependency CHAIN per image
# (pw1 -> dw -> pw2 -> towers -> preds), so its big VPU phases — the
# 512-channel depthwise (~2 ms per 64x4096px, AT the VPU's integer
# speed-of-light per the r3 ablation) plus GN stats / SiLU / normalize
# bands — have no independent MXU work to hide under; Mosaic's scheduler
# overlaps whatever is independent (proven in r3 when the standalone
# normalize passes overlapped the dots) but a chain gives it nothing.
# v2 manufactures the missing independence: each program processes TWO
# images with the phase sequence offset by one step,
#
#   step1: A.pw1          step2: A.dw  | B.pw1     step3: A.pw2 | B.dw
#   step4: A.towC | B.pw2 ...          step8: B.predR
#
# so image A's VPU depthwise traces interleaved with image B's MXU pw1
# (and so on down the pipe) inside ONE straight-line region — exactly the
# co-issue material the scheduler lacked.
#
# Two structural changes make the doubled residency fit in VMEM at the
# COCO P3 level (112x176x256: ~98 MB live for the pair):
#   * the pw1 pre-norm scratch is GONE — pass 1 computes dots only for
#     the GN stats, and the dw band RECOMPUTES its pw1 rows from the
#     resident int8 input ((rc+2)/rc extra MXU work, which the MXU has
#     headroom for).  Numerics: the recomputed z1 stays f32 where v1
#     round-tripped bf16 scratch — sub-LSB-closer to the XLA oracle.
#   * the tower pre-norm reuses the (dead after pw2) dw scratch's first
#     cin channels instead of its own buffer.
# ---------------------------------------------------------------------------
def _qhead_kernel2(x_ref, w1_ref, wdw_ref, w2_ref, wc_ref, wr_ref, wpc_ref,
                   wcr_ref, g1_ref, g2_ref, gn_ref, sc_ref, sm_ref,
                   cls_ref, cr_ref, z2_s, yq_s, *,
                   height, width, cin, row_chunk, pred_pad, pred_pad_cr):
    c2 = 2 * cin
    npix = height * width
    rc = row_chunk
    a1r = sc_ref[0, :]
    adw = sc_ref[1, :]
    a2r, b2r = sc_ref[2, :cin], sc_ref[3, :cin]
    acr_t = sc_ref[4, :cin]
    arr_t = sc_ref[5, :cin]
    apc, bpc = sc_ref[6, :pred_pad], sc_ref[7, :pred_pad]
    acr_p, bcr_p = sc_ref[8, :pred_pad_cr], sc_ref[9, :pred_pad_cr]
    gamma1, beta1 = gn_ref[0, :], gn_ref[1, :]
    gamma2, beta2 = gn_ref[2, :], gn_ref[3, :]
    gammac, betac = gn_ref[4, :cin], gn_ref[5, :cin]
    gammar, betar = gn_ref[6, :cin], gn_ref[7, :cin]
    inv_x2 = sm_ref[0, 1]
    res_mul = sm_ref[0, 2]
    chunks = list(range(0, height, rc))
    n_ch = len(chunks)

    def ch_sums(z2d):
        if _ABL in ("nostats", "skeleton"):
            z = jnp.zeros((1, z2d.shape[1]), jnp.float32)
            return z, z + 1.0
        return (jnp.sum(z2d, axis=0, keepdims=True),
                jnp.sum(z2d * z2d, axis=0, keepdims=True))

    # per-image pipeline state (mult/shift vectors land here between phases)
    st8 = [dict() for _ in range(2)]
    Z2 = (jnp.zeros((1, c2), jnp.float32),) * 2
    ZC = (jnp.zeros((1, cin), jnp.float32),) * 2

    def norm_clip(z, mult, shift):
        if _ABL == "skeleton":
            return _clip8(z)
        return _clip8(jnp.maximum(z * mult + shift, 0.0))

    def pad_band(q, r0, width_, ch):
        """Static zero-row padding for an edge band built from clamped rows
        [max(r0-1,0), min(r0+rc+1,height)); q already holds those rows."""
        lo, hi = r0 - 1, r0 + rc + 1
        clo, chi = max(lo, 0), min(hi, height)
        zrow = jnp.zeros((1, width_, ch), jnp.int8)
        for _ in range(clo - lo):
            q = jnp.concatenate([zrow, q], axis=0)
        for _ in range(hi - chi):
            q = jnp.concatenate([q, zrow], axis=0)
        return q

    # ---- phase objects ----------------------------------------------------
    # Each phase: carry0 tuple; edge(k_static, carry); interior(r0_traced,
    # carry); fin(carry).  Interior bodies use ONLY in-bounds dynamic
    # slices, so the zipped fori_loop over chunks 1..n-2 keeps the traced
    # code ~3 chunk bodies per phase instead of n — the r5 rewrite that
    # shrinks the pair-kernel's MLIR below the v1 kernel's (the first cut
    # unrolled everything and OOM'd the remote compile helper).

    class _P:
        def __init__(self, carry0, edge, interior, fin):
            self.carry0, self.edge, self.interior, self.fin = (
                carry0, edge, interior, fin)

    def p1_phase(i):
        def body(r0, carry):
            xs = x_ref[i, pl.ds(r0, rc)].reshape(rc * width, cin)
            z = _dot_i8(xs, w1_ref[:]).astype(jnp.float32) * a1r
            ds, dss = ch_sums(z)
            return carry[0] + ds, carry[1] + dss

        def fin(carry):
            st8[i]["m1"], st8[i]["sh1"] = _gn_vectors(
                carry[0], carry[1], g2_ref, gamma1, beta1, npix,
                c2 // NUM_GROUPS)

        return _P(Z2, lambda k, c: body(chunks[k], c), body, fin)

    def _pw1_band(i, r0, lo, hi):
        """Normalized int8 pw1 rows [lo, hi) recomputed from x (static pad
        to the [r0-1, r0+rc+1) band when clamped)."""
        nrows = hi - lo if isinstance(hi, int) and isinstance(lo, int) else rc + 2
        xs = x_ref[i, pl.ds(lo, nrows)].reshape(nrows * width, cin)
        z = _dot_i8(xs, w1_ref[:]).astype(jnp.float32) * a1r
        q = norm_clip(z, st8[i]["m1"], st8[i]["sh1"]).reshape(nrows, width, c2)
        return q

    def p2_phase(i):
        def core(r0, band, carry):
            acc = jnp.zeros((rc, width, c2), jnp.int32)
            for ky in range(3):
                rows = band[ky:ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, width, c2)
                    if _ABL != "nodw":
                        acc = acc + win.astype(jnp.int32) * wdw_ref[3 * ky + kx, :].astype(jnp.int32)
            z = acc.astype(jnp.float32) * adw
            ds, dss = ch_sums(z.reshape(rc * width, c2))
            z2_s[i, pl.ds(r0, rc)] = z.astype(jnp.bfloat16)
            return carry[0] + ds, carry[1] + dss

        def edge(k, carry):
            r0 = chunks[k]
            clo, chi = max(r0 - 1, 0), min(r0 + rc + 1, height)
            band = pad_band(_pw1_band(i, r0, clo, chi), r0, width, c2)
            return core(r0, band, carry)

        def interior(r0, carry):
            band = _pw1_band(i, r0, r0 - 1, None)  # rc+2 in-bounds rows
            return core(r0, band, carry)

        def fin(carry):
            st8[i]["m2"], st8[i]["sh2"] = _gn_vectors(
                carry[0], carry[1], g2_ref, gamma2, beta2, npix,
                c2 // NUM_GROUPS)

        return _P(Z2, edge, interior, fin)

    def p3_phase(i):
        def body(r0, carry):
            z = z2_s[i, pl.ds(r0, rc)].astype(jnp.float32)
            if _ABL == "skeleton":
                x2 = z
            elif _ABL == "nosilu":
                x2 = jnp.maximum(z * st8[i]["m2"] + st8[i]["sh2"], 0.0)
            else:
                x2 = _silu(z * st8[i]["m2"] + st8[i]["sh2"])
            xs = _clip8(x2 * inv_x2).reshape(rc * width, c2)
            y = _dot_i8(xs, w2_ref[:]).astype(jnp.float32) * a2r + b2r
            res = x_ref[i, pl.ds(r0, rc)].reshape(rc * width, cin)
            y = y + res.astype(jnp.float32) * res_mul
            yq_s[i, pl.ds(r0, rc)] = _clip8(y).reshape(rc, width, cin)
            return carry

        return _P((), lambda k, c: body(chunks[k], c), body, lambda c: None)

    def tower_phase(i, w_t, a_t, gmm, bt, mkey):
        def core(r0, band, carry):
            acc = jnp.zeros((rc * width, cin), jnp.int32)
            for ky in range(3):
                rows = band[ky:ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, width, cin)
                    acc = acc + _dot_i8(win.reshape(rc * width, cin), w_t[ky, kx])
            z = acc.astype(jnp.float32) * a_t
            ds, dss = ch_sums(z.reshape(rc * width, cin))
            z2_s[i, pl.ds(r0, rc), :, :cin] = z.reshape(
                rc, width, cin).astype(jnp.bfloat16)
            return carry[0] + ds, carry[1] + dss

        def edge(k, carry):
            r0 = chunks[k]
            clo, chi = max(r0 - 1, 0), min(r0 + rc + 1, height)
            band = pad_band(yq_s[i, clo:chi], r0, width, cin)
            return core(r0, band, carry)

        def interior(r0, carry):
            band = yq_s[i, pl.ds(r0 - 1, rc + 2)]
            return core(r0, band, carry)

        def fin(carry):
            st8[i][mkey + "m"], st8[i][mkey + "sh"] = _gn_vectors(
                carry[0], carry[1], g1_ref, gmm, bt, npix, cin // NUM_GROUPS)

        return _P(ZC, edge, interior, fin)

    def pred_phase(i, w_p, a_p, b_p, out_ref, mkey, pad):
        def core(r0, band, carry):
            acc = jnp.zeros((rc * width, pad), jnp.int32)
            for ky in range(3):
                rows = band[ky:ky + rc]
                for kx in range(3):
                    win = _shift_cols(rows, kx, 1, width, cin)
                    acc = acc + _dot_i8(win.reshape(rc * width, cin), w_p[ky, kx])
            out = acc.astype(jnp.float32) * a_p + b_p
            out_ref[i, pl.ds(r0, rc)] = out.reshape(
                rc, width, pad).astype(jnp.bfloat16)
            return carry

        def band_of(z):
            return norm_clip(z.astype(jnp.float32), st8[i][mkey + "m"],
                             st8[i][mkey + "sh"])

        def edge(k, carry):
            r0 = chunks[k]
            clo, chi = max(r0 - 1, 0), min(r0 + rc + 1, height)
            band = pad_band(band_of(z2_s[i, clo:chi, :, :cin]), r0, width, cin)
            return core(r0, band, carry)

        def interior(r0, carry):
            band = band_of(z2_s[i, pl.ds(r0 - 1, rc + 2), :, :cin])
            return core(r0, band, carry)

        return _P((), edge, interior, lambda c: None)

    def phases_for(i):
        return [
            p1_phase(i),
            p2_phase(i),
            p3_phase(i),
            tower_phase(i, wc_ref, acr_t, gammac, betac, "c"),
            pred_phase(i, wpc_ref, apc, bpc, cls_ref, "c", pred_pad),
            tower_phase(i, wr_ref, arr_t, gammar, betar, "r"),
            pred_phase(i, wcr_ref, acr_p, bcr_p, cr_ref, "r", pred_pad_cr),
        ]

    def run_zip(pa, pb):
        """One pipeline step: phase pa of image A zipped chunk-for-chunk
        with phase pb of image B — the interior chunks ride ONE shared
        fori_loop whose body holds both phases' work (the co-issue
        material), the edge chunks stay static."""
        ca = pa.carry0 if pa is not None else ()
        cb = pb.carry0 if pb is not None else ()
        na = len(ca)
        if pa is not None:
            ca = pa.edge(0, ca)
        if pb is not None:
            cb = pb.edge(0, cb)
        if n_ch > 2:
            def body(k, carry):
                a2 = tuple(carry[:na])
                b2 = tuple(carry[na:])
                r0 = k * rc
                if pa is not None:
                    a2 = pa.interior(r0, a2)
                if pb is not None:
                    b2 = pb.interior(r0, b2)
                return tuple(a2) + tuple(b2)

            carry = jax.lax.fori_loop(1, n_ch - 1, body, tuple(ca) + tuple(cb))
            ca = tuple(carry[:na])
            cb = tuple(carry[na:])
        if n_ch > 1:
            if pa is not None:
                ca = pa.edge(n_ch - 1, ca)
            if pb is not None:
                cb = pb.edge(n_ch - 1, cb)
        if pa is not None:
            pa.fin(ca)
        if pb is not None:
            pb.fin(cb)

    a_list = phases_for(0)
    b_list = phases_for(1)
    n_ph = len(a_list)
    run_zip(a_list[0], None)
    for k in range(1, n_ph):
        run_zip(a_list[k], b_list[k - 1])
    run_zip(None, b_list[n_ph - 1])


def qhishead_level2(q, lv, x_q, *, num_classes: int | None = None,
                    row_chunk: int = 16, interpret: bool = False):
    """Image-pair pipelined variant of :func:`qhishead_level` (v2).

    Semantics and quantization contract identical to v1 (same epilogue
    algebra; the recomputed pw1 band keeps f32 where v1 round-tripped
    bf16 — sub-LSB).  Requires an even batch; odd batches fall back to
    v1 transparently.
    """
    from pytorch_object_detection_tpu.ops.pallas_qhis import pick_row_chunk

    bsz, h, w, cin = x_q.shape
    if bsz % 2:
        return qhishead_level(q, lv, x_q, num_classes=num_classes,
                              row_chunk=row_chunk, interpret=interpret)
    c2 = 2 * cin
    nc = int(num_classes) if num_classes is not None else int(q["num_classes"])
    pred_pad = _pred_pad_for(nc)
    pred_pad_cr = 32  # cnt|reg needs 5 channels; its own lane pad saves VMEM
    assert pred_pad <= c2, (nc, c2)
    # pair residency: at the COCO P3 level the rc=16 pair kernel's register
    # spill slots alone are 23.6 MB and the program lands 3.5 MB over the
    # 128 MB VMEM (r5 compile log); rc=8 fits and measures 11.96 ms vs
    # v1's 14.25.  Small levels keep the tuned 16.
    if row_chunk >= 16 and 16 * h * w * cin > 60 * 2**20:
        row_chunk = 8
    row_chunk = pick_row_chunk(h, row_chunk)

    wpc, apc, bpc = _pad_pred(q["wpc"], lv["Apc"], q["bpc"], pred_pad)
    wcr, acr, bcr = _pad_pred(q["wcr"], lv["Acr"], q["bcr"], pred_pad_cr)

    def row(v, n=c2):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, n - v.shape[0]))

    scales = jnp.stack([
        row(lv["A1"]), row(lv["Adw"]), row(lv["A2"]), row(lv["B2"]),
        row(lv["Ac"]), row(lv["Ar"]),
        row(apc), row(bpc), row(acr), row(bcr),
    ])
    gn = jnp.stack([
        row(q["gn1"][0] * lv["inv_x1"]), row(q["gn1"][1] * lv["inv_x1"]),
        row(q["gn2"][0]), row(q["gn2"][1]),
        row(q["gnc"][0] * lv["inv_c"]), row(q["gnc"][1] * lv["inv_c"]),
        row(q["gnr"][0] * lv["inv_r"]), row(q["gnr"][1] * lv["inv_r"]),
    ])
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
        _qhead_kernel2, height=h, width=w, cin=cin, row_chunk=row_chunk,
        pred_pad=pred_pad, pred_pad_cr=pred_pad_cr,
    )
    whole = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    flops = 2 * bsz * h * w * (
        cin * c2 * 2 + 9 * c2 + 9 * cin * cin * 2 + 9 * cin * pred_pad * 2
        + cin * c2  # pw1 recompute in the dw band
    )
    cls, cr = pl.pallas_call(
        kern,
        grid=(bsz // 2,),
        in_specs=[
            pl.BlockSpec((2, h, w, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            whole(cin, c2), whole(9, c2), whole(c2, cin),
            whole(3, 3, cin, cin), whole(3, 3, cin, cin),
            whole(3, 3, cin, pred_pad), whole(3, 3, cin, pred_pad_cr),
            whole(cin, NUM_GROUPS), whole(c2, NUM_GROUPS),
            whole(8, c2), whole(10, c2),
            pl.BlockSpec((1, 6), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, h, w, pred_pad), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, w, pred_pad_cr), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, pred_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, h, w, pred_pad_cr), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, h, w, c2), jnp.bfloat16),  # z2 (dw pre-norm; its
            # first cin channels double as the tower pre-norm after pw2)
            pltpu.VMEM((2, h, w, cin), jnp.int8),     # yq (stem output)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bsz * h * w * (cin + 4 * pred_pad),
            transcendentals=bsz * h * w * c2,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x_q, w1, wdw, w2, q["wc"], q["wr"], wpc, wcr,
      member(cin), member(c2), gn, scales, sm)
    return cls[..., :nc], cr[..., :5]
