"""Fused HISHead level kernel: the entire head for one pyramid level rides
VMEM per image — inverted-bottleneck stem (pw1 -> GN+ReLU -> depthwise3x3
-> GN+SiLU -> pw2 + residual), both towers (conv3x3 -> GN+ReLU) and the
three prediction convs, in ONE Pallas program.

Why: unfused, the head + its GroupNorms are ~15 ms of a 45 ms B=64 eval
iteration (trace), mostly HBM round-trips over P3-sized tensors plus XLA
layout copies; the arithmetic floor is ~7 ms.  Inside the kernel the level
input is read once and a single packed [H, W, 25] map (cls 20 | cnt 1 |
reg 4) is written; every intermediate including the four GroupNorm
stats passes stays on-chip.

GroupNorm stats use the channel->group membership-matrix dot trick
(Mosaic cannot reshape the lane dim).  3x3 convs are nine shifted bf16
dots; the depthwise conv is nine shifted VPU multiply-adds.

Weight layout contract = models/heads.HISHead param tree (documented at
each load); ScaleExp stays outside (tiny tensor, fuses with decode).
Reference capability: model/od/HISFcos.py:45-74 head, redesigned TPU-first.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUPS = 32


def _member(ch):
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (ch, GROUPS), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (ch, GROUPS), 1)
    return (ch_ids // (ch // GROUPS) == g_ids).astype(jnp.float32)


def _gn_vectors(sums, sq, n, scale, bias, ch, eps=1e-5):
    """Per-channel (mul, add) from accumulated per-channel sums/sumsq."""
    member = _member(ch)
    gsum = jnp.dot(sums, member, preferred_element_type=jnp.float32)
    gsq = jnp.dot(sq, member, preferred_element_type=jnp.float32)
    mean = gsum / n
    var = gsq / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(mean, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv, member.T, preferred_element_type=jnp.float32)
    mul = inv_c * scale.reshape(1, ch)
    add = bias.reshape(1, ch) - mean_c * mul
    return mul, add


def _dot(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _im2col_rows(src_ref, r0, rc, height, width, ch_in, pre=None):
    """[rc*width, 9*ch_in] im2col band for output rows [r0, r0+rc).

    One im2col feeds every conv sharing this input as a single K=9*ch dot —
    v1's 9-dots-per-conv scheme left the MXU idle behind VPU window
    shuffles (P3 kernel 9.5 ms vs ~5 ms floor); here windows are built once
    and the dots are big.  ``pre`` maps the loaded band (e.g. GN+act).
    Channel order: tap-major (ky,kx,ch) == w9.reshape(9*ch, co).
    """
    lo = max(r0 - 1, 0)
    hi = min(r0 + rc + 1, height)
    band = src_ref[pl.ds(lo * width, (hi - lo) * width), :].reshape(hi - lo, width, ch_in)
    if pre is not None:
        band = pre(band)
    zrow = jnp.zeros((1, width, ch_in), band.dtype)
    if lo == r0:
        band = jnp.concatenate([zrow, band], axis=0)
    if hi == r0 + rc:
        band = jnp.concatenate([band, zrow], axis=0)
    zcol = jnp.zeros((rc, 1, ch_in), band.dtype)
    wins = []
    for ky in range(3):
        rows = band[ky:ky + rc]
        for kx in range(3):
            if kx == 0:
                win = jnp.concatenate([zcol, rows[:, : width - 1]], axis=1)
            elif kx == 2:
                win = jnp.concatenate([rows[:, 1:], zcol], axis=1)
            else:
                win = rows
            wins.append(win)
    return jnp.concatenate(wins, axis=-1).reshape(rc * width, 9 * ch_in)


def _hishead_kernel(x_ref, pw1_ref, dw_ref, pw2_ref, cls_ref, reg_ref,
                    pred_cls_ref, pred_cr_ref, gn_ref, bias_ref, out_ref,
                    t1, t2, ybuf, cbuf, rbuf, *,
                    height, width, f, f2, nc, row_chunk):
    hw = height * width
    n1 = hw * (f2 // GROUPS)
    n2 = hw * (f // GROUPS)

    # ---- pw1 + gn1 stats --------------------------------------------------
    s1 = jnp.zeros((1, f2), jnp.float32)
    q1 = jnp.zeros((1, f2), jnp.float32)
    for r0 in range(0, height, row_chunk):
        xs = x_ref[0, r0:r0 + row_chunk].reshape(row_chunk * width, f)
        v = _dot(xs, pw1_ref[:])
        s1 = s1 + v.sum(axis=0, keepdims=True)
        q1 = q1 + (v * v).sum(axis=0, keepdims=True)
        t1[pl.ds(r0 * width, row_chunk * width), :] = v.astype(jnp.bfloat16)
    mul1, add1 = _gn_vectors(s1, q1, n1, gn_ref[0, :f2], gn_ref[1, :f2], f2)

    # ---- depthwise 3x3 on relu(gn1(t1)) + gn2 stats ------------------------
    # bf16 VPU arithmetic: halves shuffle/copy bytes; the 9-tap bf16
    # accumulation noise (~0.4%) is below the head's bf16 dot noise anyway
    dw = dw_ref[:].astype(jnp.bfloat16)  # [9, f2]
    mul1_b = mul1.astype(jnp.bfloat16)
    add1_b = add1.astype(jnp.bfloat16)
    s2 = jnp.zeros((1, f2), jnp.float32)
    q2 = jnp.zeros((1, f2), jnp.float32)
    for r0 in range(0, height, row_chunk):
        lo = max(r0 - 1, 0)
        hi = min(r0 + row_chunk + 1, height)
        band = t1[pl.ds(lo * width, (hi - lo) * width), :]
        band = jnp.maximum(band * mul1_b + add1_b, 0).reshape(hi - lo, width, f2)
        zrow = jnp.zeros((1, width, f2), jnp.bfloat16)
        if lo == r0:
            band = jnp.concatenate([zrow, band], axis=0)
        if hi == r0 + row_chunk:
            band = jnp.concatenate([band, zrow], axis=0)
        zcol = jnp.zeros((row_chunk, 1, f2), jnp.bfloat16)
        acc = jnp.zeros((row_chunk, width, f2), jnp.bfloat16)
        for ky in range(3):
            rows = band[ky:ky + row_chunk]
            for kx in range(3):
                if kx == 0:
                    win = jnp.concatenate([zcol, rows[:, : width - 1]], axis=1)
                elif kx == 2:
                    win = jnp.concatenate([rows[:, 1:], zcol], axis=1)
                else:
                    win = rows
                acc = acc + win * dw[3 * ky + kx]
        v = acc.reshape(row_chunk * width, f2)
        v32 = v.astype(jnp.float32)
        s2 = s2 + v32.sum(axis=0, keepdims=True)
        q2 = q2 + (v32 * v32).sum(axis=0, keepdims=True)
        t2[pl.ds(r0 * width, row_chunk * width), :] = v
    mul2, add2 = _gn_vectors(s2, q2, n1, gn_ref[2, :f2], gn_ref[3, :f2], f2)

    # ---- pw2 + residual -> y ----------------------------------------------
    mul2_b = mul2.astype(jnp.bfloat16)
    add2_b = add2.astype(jnp.bfloat16)
    for r0 in range(0, height, row_chunk):
        v = t2[pl.ds(r0 * width, row_chunk * width), :]
        v = v * mul2_b + add2_b
        # sigmoid in f32: Mosaic's bf16 logistic lowering miscompiles
        # (vector.broadcast element-type verification error)
        v = v * jax.nn.sigmoid(v.astype(jnp.float32)).astype(jnp.bfloat16)
        y = _dot(v, pw2_ref[:]) + bias_ref[0, :f]
        y = y + x_ref[0, r0:r0 + row_chunk].reshape(row_chunk * width, f).astype(jnp.float32)
        ybuf[pl.ds(r0 * width, row_chunk * width), :] = y.astype(jnp.bfloat16)

    # ---- towers: conv3x3(y) with gn stats (ONE shared im2col, two dots) ----
    sc = jnp.zeros((1, f), jnp.float32)
    qc = jnp.zeros((1, f), jnp.float32)
    sr = jnp.zeros((1, f), jnp.float32)
    qr = jnp.zeros((1, f), jnp.float32)
    for r0 in range(0, height, row_chunk):
        imcol = _im2col_rows(ybuf, r0, row_chunk, height, width, f)
        c = _dot(imcol, cls_ref[:].reshape(9 * f, f))
        sc = sc + c.sum(axis=0, keepdims=True)
        qc = qc + (c * c).sum(axis=0, keepdims=True)
        cbuf[pl.ds(r0 * width, row_chunk * width), :] = c.astype(jnp.bfloat16)
        r = _dot(imcol, reg_ref[:].reshape(9 * f, f))
        sr = sr + r.sum(axis=0, keepdims=True)
        qr = qr + (r * r).sum(axis=0, keepdims=True)
        rbuf[pl.ds(r0 * width, row_chunk * width), :] = r.astype(jnp.bfloat16)
    mulc, addc = _gn_vectors(sc, qc, n2, gn_ref[4, :f], gn_ref[5, :f], f)
    mulr, addr = _gn_vectors(sr, qr, n2, gn_ref[6, :f], gn_ref[7, :f], f)

    # ---- prediction convs on relu(gn(tower)) -> packed [H, W, 25] ----------
    mulc_b, addc_b = mulc.astype(jnp.bfloat16), addc.astype(jnp.bfloat16)
    mulr_b, addr_b = mulr.astype(jnp.bfloat16), addr.astype(jnp.bfloat16)
    for r0 in range(0, height, row_chunk):
        def pre_c(band):
            s = band.shape
            v = band.reshape(-1, f) * mulc_b + addc_b
            return jnp.maximum(v, 0).reshape(s)

        def pre_r(band):
            s = band.shape
            v = band.reshape(-1, f) * mulr_b + addr_b
            return jnp.maximum(v, 0).reshape(s)

        imc = _im2col_rows(cbuf, r0, row_chunk, height, width, f, pre=pre_c)
        cls_out = _dot(imc, pred_cls_ref[:].reshape(9 * f, nc)) + bias_ref[1, :nc]
        imr = _im2col_rows(rbuf, r0, row_chunk, height, width, f, pre=pre_r)
        cr_out = _dot(imr, pred_cr_ref[:].reshape(9 * f, 5)) + bias_ref[2, :5]
        packed = jnp.concatenate([cls_out, cr_out], axis=1)  # [rc*W, nc+5]
        out_ref[0, r0:r0 + row_chunk] = packed.reshape(
            row_chunk, width, nc + 5).astype(jnp.bfloat16)


def hishead_params_pack(params, num_classes: int, dtype=jnp.bfloat16):
    """Flatten the HISHead param tree into the kernel's operand set."""
    f2 = params["stem_pw1"]["conv"]["kernel"].shape[-1]
    f = params["stem_pw2"]["conv"]["kernel"].shape[-1]

    def k9(tree):  # [3,3,ci,co] -> [9, ci, co]
        k = tree["conv"]["kernel"]
        return k.reshape(9, k.shape[2], k.shape[3]).astype(dtype)

    pw1 = params["stem_pw1"]["conv"]["kernel"].reshape(f, f2).astype(dtype)
    dw = params["stem_dw"]["dw"]["conv"]["kernel"].reshape(9, f2).astype(jnp.float32)
    pw2 = params["stem_pw2"]["conv"]["kernel"].reshape(f2, f).astype(dtype)
    cls_t = k9(params["cls_tower0"])
    reg_t = k9(params["reg_tower0"])
    pred_cls = k9(params["cls_pred"])
    pred_cr = jnp.concatenate(
        [k9(params["cnt_pred"]), k9(params["reg_pred"])], axis=-1)  # [9, f, 5]
    gn = jnp.stack([
        jnp.pad(params["stem_gn1"]["gn"]["scale"].astype(jnp.float32), (0, 0)),
        params["stem_gn1"]["gn"]["bias"].astype(jnp.float32),
        params["stem_gn2"]["gn"]["scale"].astype(jnp.float32),
        params["stem_gn2"]["gn"]["bias"].astype(jnp.float32),
        jnp.pad(params["cls_gn0"]["gn"]["scale"].astype(jnp.float32), (0, f2 - f)),
        jnp.pad(params["cls_gn0"]["gn"]["bias"].astype(jnp.float32), (0, f2 - f)),
        jnp.pad(params["reg_gn0"]["gn"]["scale"].astype(jnp.float32), (0, f2 - f)),
        jnp.pad(params["reg_gn0"]["gn"]["bias"].astype(jnp.float32), (0, f2 - f)),
    ])  # [8, f2]
    nc = num_classes
    width_b = max(f, nc + 5)
    bias = jnp.zeros((3, width_b), jnp.float32)
    bias = bias.at[0, :f].set(params["stem_pw2"]["conv"]["bias"].astype(jnp.float32))
    bias = bias.at[1, :nc].set(params["cls_pred"]["conv"]["bias"].astype(jnp.float32))
    bias = bias.at[2, 0].set(params["cnt_pred"]["conv"]["bias"].astype(jnp.float32)[0])
    bias = bias.at[2, 1:5].set(params["reg_pred"]["conv"]["bias"].astype(jnp.float32))
    return dict(pw1=pw1, dw=dw, pw2=pw2, cls_t=cls_t, reg_t=reg_t,
                pred_cls=pred_cls, pred_cr=pred_cr, gn=gn, bias=bias,
                f=f, f2=f2)


def hishead_level_fused(x, packed, num_classes: int, row_chunk: int = 0,
                        interpret: bool = False):
    """One pyramid level through the fused head.  x [B,H,W,f] bf16.

    Returns packed [B,H,W,num_classes+5] bf16: cls logits | cnt | reg(raw,
    pre-ScaleExp).
    """
    bsz, h, w, f = x.shape
    f2 = packed["f2"]
    nc = num_classes
    if row_chunk <= 0:
        # keep per-chunk f32 intermediates ~1-2 MB (bigger chunks spill VMEM
        # registers: P3 at 64 rows measured 1.9x slower than 16)
        row_chunk = max(1, min(h, 1024 // w))
        while h % row_chunk:
            row_chunk -= 1
    hw = h * w
    kern = functools.partial(
        _hishead_kernel, height=h, width=w, f=f, f2=f2, nc=nc, row_chunk=row_chunk,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, f), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            full((f, f2)), full((9, f2)), full((f2, f)),
            full((9, f, f)), full((9, f, f)),
            full((9, f, nc)), full((9, f, 5)),
            full((8, f2)), full((3, packed["bias"].shape[-1])),
        ],
        out_specs=pl.BlockSpec((1, h, w, nc + 5), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, nc + 5), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((hw, f2), jnp.bfloat16),   # t1
            pltpu.VMEM((hw, f2), jnp.bfloat16),   # t2
            pltpu.VMEM((hw, f), jnp.bfloat16),    # y
            pltpu.VMEM((hw, f), jnp.bfloat16),    # cls tower
            pltpu.VMEM((hw, f), jnp.bfloat16),    # reg tower
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hw * (f * f2 * 2 + 9 * f * f * 2 + 9 * f * (nc + 5)),
            bytes_accessed=x.size * 2 + bsz * hw * (nc + 5) * 2,
            transcendentals=bsz * hw * f2,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed["pw1"], packed["dw"], packed["pw2"],
      packed["cls_t"], packed["reg_t"],
      packed["pred_cls"], packed["pred_cr"], packed["gn"], packed["bias"])
    return out
