"""Whole-HisBlock fused int8 Pallas kernel (TPU).

One kernel per FPN HisBlock (nn/fpn.py HisFPN, reference
model/od/HISFcos.py:77-112): conv1(1x1)+SiLU, conv2(1x1 passthrough),
depthwise 3x3 + ReLU, SE gate, conv3(3x3)+ReLU on the [a,b] concat, and
conv4(3x3, dilation 2)+SiLU on the [m,x2] concat — HBM sees the block
input once (int8) and the output once (int8).  All intermediates
(x1/x2/a/m, int8) live in VMEM scratch; the accumulators never leave
registers.

Same design rules as the proven ResNet bottleneck kernel
(ops/pallas_qblock.py): grid=(batch,), whole level image resident per
program, static Python row-chunk loops, 3x3 convs as nine shifted int8
dots (dilation=2 shifts by two columns/rows), halos by static slicing
with zero-row/col concats — no dynamic control flow, no strided memory
access (PERF.md: int8 strided access is shuffle-bound on this TPU).

Numerics: bit-identical epilogue algebra to the XLA reference path
nn/fpn_int8._hisblock_i8_xla (integer convs + identical f32 epilogues);
verified in tests/test_quant.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_row_chunk(h: int, maximum: int = 16, even: bool = False) -> int:
    """Largest row chunk <= maximum that divides h (optionally even).

    The whole-level kernels iterate static Python row bands, so the chunk
    must divide the level height exactly; COCO's 896x1408 canvas yields
    non-power-of-two level heights (28 at stride 32) where a fixed 16 would
    fail — same policy as ops/pallas_qstem.qstem_conv.
    """
    for rc in range(min(maximum, h), 0, -1):
        if h % rc == 0 and not (even and rc % 2):
            return rc
    return 1


def _dot_i8(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _clip8(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _band(scratch, r0, rc, height, width, ch, halo):
    """rows [r0-halo, r0+rc+halo) of a [H,W,C] scratch with zero-row edges
    (dtype follows the scratch)."""
    lo, hi = max(r0 - halo, 0), min(r0 + rc + halo, height)
    xs = scratch[lo:hi]
    zrow = jnp.zeros((1, width, ch), xs.dtype)
    for _ in range(lo - (r0 - halo)):
        xs = jnp.concatenate([zrow, xs], axis=0)
    for _ in range((r0 + rc + halo) - hi):
        xs = jnp.concatenate([xs, zrow], axis=0)
    return xs  # [rc + 2*halo, W, C]


def _shift_cols(band, kx, dil, width, ch):
    """column shift by (kx-1)*dil with zero-col fill; band [R, W, C].

    Handles |shift| >= width (tiny pyramid levels): all-zero result.
    """
    off = (kx - 1) * dil
    if off == 0:
        return band
    take = max(width - abs(off), 0)
    zcol = jnp.zeros((band.shape[0], width - take, ch), band.dtype)
    if off < 0:
        return jnp.concatenate([zcol, band[:, :take]], axis=1)
    return jnp.concatenate([band[:, off:off + take], zcol], axis=1)


def _qhis_kernel(x_ref, xb_ref, w1_ref, w2_ref, wdw_ref, w3_ref, w4_ref,
                 sew1_ref, seb1_ref, sew2_ref, seb2_ref, sc_ref, sm_ref,
                 out_ref, x1q_s, x2q_s, aq_s, mq_s, *,
                 height, width, cin, half, row_chunk, combine):
    a1r, b1r = sc_ref[0, :half], sc_ref[1, :half]
    a2r, b2r = sc_ref[2, :half], sc_ref[3, :half]
    adw, bdw = sc_ref[4, :half], sc_ref[5, :half]
    a3r, b3r = sc_ref[6, :half], sc_ref[7, :half]
    a4r, b4r = sc_ref[8, :], sc_ref[9, :]
    inv_x1 = sm_ref[0, 0]
    inv_out = sm_ref[0, 1]
    se_mean_mul = sm_ref[0, 2]  # s_x1 / (H*W)
    ca, cb = sm_ref[0, 3], sm_ref[0, 4]  # combine rescales sa/s_in, sb/s_in

    x_img = x_ref[0]  # [H, W, Cin] int8 ('up_add': [H/2, W/2, Cin])

    def input_rows(r0):
        """Block-input rows [r0, r0+row_chunk) — fuses the FPN level glue
        (upsample-add / pool-add requant) into the kernel, so the combined
        input never exists in HBM."""
        if combine is None:
            return x_img[r0:r0 + row_chunk]
        xb = xb_ref[0][r0:r0 + row_chunk].astype(jnp.float32)
        if combine == "add":
            xa = x_img[r0:r0 + row_chunk].astype(jnp.float32)
        else:  # 'up_add': x_img is the coarser level, 2x-replicate rows+cols
            da = x_img[r0 // 2:(r0 + row_chunk) // 2]  # [RC/2, W/2, C]
            da = jnp.broadcast_to(
                da[:, None], (row_chunk // 2, 2, width // 2, cin)
            ).reshape(row_chunk, width // 2, cin)
            da = jnp.broadcast_to(
                da[:, :, None, :], (row_chunk, width // 2, 2, cin)
            ).reshape(row_chunk, width, cin)
            xa = da.astype(jnp.float32)
        return _clip8(xa * ca + xb * cb)

    # ---- phase 1: conv1 (SiLU) + conv2 (linear), SE sum accumulation
    se_sum = jnp.zeros((1, half), jnp.float32)
    for r0 in range(0, height, row_chunk):
        xs = input_rows(r0).reshape(row_chunk * width, cin)
        acc1 = _dot_i8(xs, w1_ref[:]).astype(jnp.float32)
        x1 = _silu(acc1 * a1r + b1r)
        x1q = _clip8(x1 * inv_x1)
        x1q_s[r0:r0 + row_chunk] = x1q.reshape(row_chunk, width, half)
        se_sum = se_sum + jnp.sum(x1q.astype(jnp.float32), axis=0, keepdims=True)
        acc2 = _dot_i8(xs, w2_ref[:]).astype(jnp.float32)
        x2q_s[r0:r0 + row_chunk] = _clip8(acc2 * a2r + b2r).reshape(
            row_chunk, width, half
        )

    # ---- phase 2: SE gate (f32, two tiny dots)
    mean = se_sum * se_mean_mul  # [1, half]
    g = _silu(
        jax.lax.dot_general(mean, sew1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + seb1_ref[:]
    )
    g = jax.nn.sigmoid(
        jax.lax.dot_general(g, sew2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + seb2_ref[:]
    )  # [1, half]
    g3 = g.reshape(1, 1, half)

    # ---- phase 3: depthwise 3x3 + ReLU -> a (int8)
    for r0 in range(0, height, row_chunk):
        band = _band(x1q_s, r0, row_chunk, height, width, half, 1)
        acc = jnp.zeros((row_chunk, width, half), jnp.int32)
        for ky in range(3):
            rows = band[ky:ky + row_chunk]
            for kx in range(3):
                win = _shift_cols(rows, kx, 1, width, half)
                wrow = wdw_ref[3 * ky + kx, :].astype(jnp.int32)
                acc = acc + win.astype(jnp.int32) * wrow
        aq = _clip8(jnp.maximum(acc.astype(jnp.float32) * adw + bdw, 0.0))
        aq_s[r0:r0 + row_chunk] = aq

    # ---- phase 4: conv3 3x3 on concat([a, x1*g]) -> m (int8)
    for r0 in range(0, height, row_chunk):
        a_band = _band(aq_s, r0, row_chunk, height, width, half, 1)
        x1_band = _band(x1q_s, r0, row_chunk, height, width, half, 1)
        b_band = _clip8(x1_band.astype(jnp.float32) * g3)
        cat = jnp.concatenate([a_band, b_band], axis=-1)  # [RC+2, W, 2*half]
        acc = jnp.zeros((row_chunk * width, half), jnp.int32)
        for ky in range(3):
            rows = cat[ky:ky + row_chunk]
            for kx in range(3):
                win = _shift_cols(rows, kx, 1, width, 2 * half)
                acc = acc + _dot_i8(win.reshape(row_chunk * width, 2 * half),
                                    w3_ref[ky, kx])
        mq = _clip8(jnp.maximum(acc.astype(jnp.float32) * a3r + b3r, 0.0))
        mq_s[r0:r0 + row_chunk] = mq.reshape(row_chunk, width, half)

    # ---- phase 5: conv4 3x3 dilation-2 + SiLU on concat([m, x2]) -> out
    for r0 in range(0, height, row_chunk):
        m_band = _band(mq_s, r0, row_chunk, height, width, half, 2)
        x2_band = _band(x2q_s, r0, row_chunk, height, width, half, 2)
        cat = jnp.concatenate([m_band, x2_band], axis=-1)  # [RC+4, W, 2*half]
        acc = jnp.zeros((row_chunk * width, 2 * half), jnp.int32)
        for ky in range(3):
            rows = cat[2 * ky:2 * ky + row_chunk]
            for kx in range(3):
                win = _shift_cols(rows, kx, 2, width, 2 * half)
                acc = acc + _dot_i8(win.reshape(row_chunk * width, 2 * half),
                                    w4_ref[ky, kx])
        z = acc.astype(jnp.float32) * a4r + b4r
        y = _silu(z) * inv_out
        out_ref[0, r0:r0 + row_chunk] = _clip8(y).reshape(row_chunk, width, 2 * half)


def qhisblock(blk, x_q, *, xb_q=None, combine=None, ca=1.0, cb=0.0,
              row_chunk: int = 16, interpret: bool = False):
    """Fused HisBlock: x_q [B,H,W,C] int8 (scale folded into blk) -> int8.

    blk: one block's entry from nn/fpn_int8.quantize_hisfpn.

    Level-glue fusion: with ``combine='add'`` the block input is
    ``clip8(x_q*ca + xb_q*cb)`` (two same-shape int8 inputs rescaled to the
    block's input scale); with ``combine='up_add'`` x_q is the coarser
    [B,H/2,W/2,C] level, 2x-replicated before the add (the HisFPN top-down
    upsample+add, HISFcos.py:157-170) — either way the combined tensor is
    built in VMEM and never written to HBM.
    """
    if combine is None:
        assert xb_q is None
        xb_q = x_q[:, :1, :1]  # dummy, unread
    bsz, h, w, cin = (xb_q if combine else x_q).shape
    half = blk["w1"].shape[-1]
    assert cin == 2 * half, (cin, half)
    row_chunk = pick_row_chunk(h, row_chunk, even=(combine == "up_add"))
    if combine == "up_add":
        assert x_q.shape[1:3] == (h // 2, w // 2)
    elif combine == "add":
        assert x_q.shape == xb_q.shape

    def row(v, n=half):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cin - v.shape[0]))

    scales = jnp.stack([
        row(blk["A1"]), row(blk["B1"]), row(blk["A2"]), row(blk["B2"]),
        row(blk["Adw"]), row(blk["Bdw"]), row(blk["A3"]), row(blk["B3"]),
        row(blk["A4"]), row(blk["B4"]),
    ])  # [10, cin] f32
    sm = jnp.stack([
        jnp.asarray(blk["inv_x1"], jnp.float32),
        jnp.asarray(blk["inv_out"], jnp.float32),
        jnp.asarray(blk["se_premul"] / (h * w), jnp.float32),
        jnp.asarray(ca, jnp.float32),
        jnp.asarray(cb, jnp.float32),
        jnp.float32(0.0),
    ]).reshape(1, 6)

    w1 = blk["w1"].reshape(cin, half)
    w2 = blk["w2"].reshape(cin, half)
    wdw = blk["wdw"].reshape(9, half)
    w3 = blk["w3"]  # [3,3,cin,half]
    w4 = blk["w4"]  # [3,3,cin,cin]
    sew1 = blk["se_w1"]  # [half, r]
    seb1 = blk["se_b1"].reshape(1, -1)
    sew2 = blk["se_w2"]  # [r, half]
    seb2 = blk["se_b2"].reshape(1, -1)
    r = sew1.shape[1]

    kern = functools.partial(
        _qhis_kernel, height=h, width=w, cin=cin, half=half, row_chunk=row_chunk,
        combine=combine,
    )
    whole = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    flops = 2 * bsz * h * w * (
        cin * half * 2 + 9 * cin * half + 9 * cin * cin + 9 * half
    )
    ha, wa = x_q.shape[1:3]
    hb, wb = xb_q.shape[1:3]
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, ha, wa, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wb, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            whole(cin, half), whole(cin, half), whole(9, half),
            whole(3, 3, cin, half), whole(3, 3, cin, cin),
            whole(half, r), whole(1, r), whole(r, half), whole(1, half),
            whole(10, cin),
            pl.BlockSpec((1, 6), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cin), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cin), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h, w, half), jnp.int8),
            pltpu.VMEM((h, w, half), jnp.int8),
            pltpu.VMEM((h, w, half), jnp.int8),
            pltpu.VMEM((h, w, half), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * bsz * h * w * cin + w3.size + w4.size,
            transcendentals=bsz * h * w * cin * 2,
        ),
        # 124 MB of the v5e's 128 MB VMEM: COCO-canvas levels need >100
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x_q, xb_q, w1, w2, wdw, w3, w4, sew1, seb1, sew2, seb2, scales, sm)
