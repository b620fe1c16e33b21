"""Whole-bottleneck fused int8 Pallas kernel (stride-1 ResNet blocks).

One kernel computes conv1(1x1) -> ReLU -> conv2(3x3 SAME) -> ReLU ->
conv3(1x1) -> +residual -> ReLU -> requantize for an entire bottleneck
block: HBM sees the block input once (int8) and the block output once
(int8).  The a1/a2 intermediates and the int32/f32 accumulators never
leave VMEM — this removes both the int32 accumulator round-trips of the
per-conv path and the residual elementwise pass that costs the bf16
XLA path ~28% of its eval iteration (trace-verified, PERF.md).

Grid is (batch,); the whole (small) feature image stays resident per
program and a static Python loop walks row chunks, so conv2's row halo is
plain static slicing with zero-row edge padding — no dynamic control flow,
no masks, MXU-only dots (int8 x int8 -> int32).

Supports the identity shortcut (res = x * short_mul) and the projection
shortcut (res = dequant(conv(x, wd))) — i.e. every stride-1 block of
ResNet-50 including layer1_0.  The three stride-2 blocks use the per-conv
kernels (ops/pallas_qconv).

Epilogue scale algebra identical to nn/resnet_int8.quantize_resnet50.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_i8(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _requant(y):
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _qblock_kernel(x_ref, w1_ref, w2_ref, w3_ref, wd_ref, sc_ref, out_ref, *,
                   height, width, cin, cw, cout, row_chunk, has_ds):
    """sc_ref: f32 scale table [8, max(cw,cout)] rows =
    A1,B1,A2,B2,A3,B3,Ad|short_mul,Bd (unused tail zero-padded)."""
    a1r = sc_ref[0, :cw]
    b1r = sc_ref[1, :cw]
    a2r = sc_ref[2, :cw]
    b2r = sc_ref[3, :cw]
    a3r = sc_ref[4, :cout]
    b3r = sc_ref[5, :cout]
    adr = sc_ref[6, :cout]
    bdr = sc_ref[7, :cout]

    x_img = x_ref[0]  # [H, W, Cin], int8, VMEM-resident

    zero_row = jnp.zeros((1, width, cw), jnp.int8)
    for r0 in range(0, height, row_chunk):
        lo = max(r0 - 1, 0)
        hi = min(r0 + row_chunk + 1, height)
        xs = x_img[lo:hi]  # [rows, W, Cin]
        rows = hi - lo
        # conv1 1x1 + BN + ReLU -> int8 a1 (halo rows included)
        acc1 = _dot_i8(xs.reshape(rows * width, cin), w1_ref[:])
        a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
        a1 = a1.reshape(rows, width, cw)
        if lo == r0:  # top edge: conv2's row -1 is zero padding
            a1 = jnp.concatenate([zero_row, a1], axis=0)
        if hi == r0 + row_chunk:  # bottom edge
            a1 = jnp.concatenate([a1, zero_row], axis=0)
        # a1 now [row_chunk + 2, W, cw]

        # conv2 3x3 SAME: nine shifted int8 dots accumulating int32
        zero_col = jnp.zeros((row_chunk, 1, cw), jnp.int8)
        acc2 = jnp.zeros((row_chunk * width, cw), jnp.int32)
        for ky in range(3):
            band = a1[ky:ky + row_chunk]  # [RC, W, cw]
            for kx in range(3):
                if kx == 0:
                    win = jnp.concatenate([zero_col, band[:, : width - 1]], axis=1)
                elif kx == 2:
                    win = jnp.concatenate([band[:, 1:], zero_col], axis=1)
                else:
                    win = band
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * width, cw), w2_ref[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        # conv3 1x1 + residual + ReLU + requant -> block output rows
        acc3 = _dot_i8(a2, w3_ref[:])
        y = acc3.astype(jnp.float32) * a3r + b3r
        x_rows = x_img[r0:r0 + row_chunk].reshape(row_chunk * width, cin)
        if has_ds:
            accd = _dot_i8(x_rows, wd_ref[:])
            y = y + accd.astype(jnp.float32) * adr + bdr
        else:
            y = y + x_rows.astype(jnp.float32) * adr  # adr = short_mul (bcast)
        out = _requant(jnp.maximum(y, 0.0))
        out_ref[0, r0:r0 + row_chunk] = out.reshape(row_chunk, width, cout)


def _qblock_s2_kernel(x_ref, w1_ref, w2_ref, w3_ref, wd_ref, sc_ref, out_ref, *,
                      height, width, cin, cw, cout, row_chunk):
    """Stride-2 bottleneck (conv2 3x3/2 + projection shortcut 1x1/2).

    Output rows are chunked; each chunk computes a1 for input rows
    [2p0-1, 2p0+2RC] on the fly (1x1 conv), applies the stride-2 window
    selection with reshape-pair tricks (all static), and fuses conv3 +
    requantized shortcut + ReLU + requant.
    """
    a1r, b1r = sc_ref[0, :cw], sc_ref[1, :cw]
    a2r, b2r = sc_ref[2, :cw], sc_ref[3, :cw]
    a3r, b3r = sc_ref[4, :cout], sc_ref[5, :cout]
    adr, bdr = sc_ref[6, :cout], sc_ref[7, :cout]

    x_img = x_ref[0]  # [H, W, Cin]
    h_out, w_out = height // 2, width // 2

    for p0 in range(0, h_out, row_chunk):
        lo = 2 * p0 - 1
        hi = 2 * p0 + 2 * row_chunk + 1  # rows [lo, hi], inclusive count 2RC+2
        clo, chi = max(lo, 0), min(hi + 1, height)
        xs = x_img[clo:chi]
        rows = chi - clo
        acc1 = _dot_i8(xs.reshape(rows * width, cin), w1_ref[:])
        a1 = _requant(jnp.maximum(acc1.astype(jnp.float32) * a1r + b1r, 0.0))
        a1 = a1.reshape(rows, width, cw)
        zrow = jnp.zeros((1, width, cw), jnp.int8)
        for _ in range(clo - lo):
            a1 = jnp.concatenate([zrow, a1], axis=0)
        for _ in range(hi + 1 - chi):
            a1 = jnp.concatenate([a1, zrow], axis=0)
        # a1: [2RC+2, W, cw]; pad cols by 1 both sides for the kx shifts
        zcol = jnp.zeros((a1.shape[0], 1, cw), jnp.int8)
        ap = jnp.concatenate([zcol, a1, zcol], axis=1)  # [2RC+2, W+2, cw]

        acc2 = jnp.zeros((row_chunk * w_out, cw), jnp.int32)
        for ky in range(3):
            band = ap[ky:ky + 2 * row_chunk]  # rows ky+2i for i<RC after pairing
            band = band.reshape(row_chunk, 2, width + 2, cw)[:, 0]  # stride-2 rows
            for kx in range(3):
                if kx == 2:
                    sl = band[:, 2:width + 2]
                else:
                    sl = band[:, kx:width + kx]
                # stride-2 cols via lane-merge: [RC, W, cw] -> [RC, W/2, 2cw]
                # puts even cols in the first cw LANES — an aligned lane
                # slice instead of the (slow) 2-sublane pair select
                win = sl.reshape(row_chunk, w_out, 2 * cw)[:, :, :cw]
                acc2 = acc2 + _dot_i8(win.reshape(row_chunk * w_out, cw), w2_ref[ky, kx])
        a2 = _requant(jnp.maximum(acc2.astype(jnp.float32) * a2r + b2r, 0.0))

        acc3 = _dot_i8(a2, w3_ref[:])
        y = acc3.astype(jnp.float32) * a3r + b3r
        # projection shortcut: x rows 2p, cols even (same lane-merge trick)
        xr = x_img[2 * p0:2 * p0 + 2 * row_chunk]
        xr = xr.reshape(row_chunk, 2, width, cin)[:, 0]
        xr = xr.reshape(row_chunk, w_out, 2 * cin)[:, :, :cin]
        accd = _dot_i8(xr.reshape(row_chunk * w_out, cin), wd_ref[:])
        y = y + accd.astype(jnp.float32) * adr + bdr
        out = _requant(jnp.maximum(y, 0.0))
        out_ref[0, p0:p0 + row_chunk] = out.reshape(row_chunk, w_out, cout)


def qbottleneck_s2(x, w1, w2, w3, wd, a1, b1, a2, b2, a3, b3, ad, bd, *,
                   row_chunk: int = 8, interpret: bool = False):
    """Fused stride-2 bottleneck block (always a projection shortcut).

    x [B,H,W,Cin] int8 -> [B,H/2,W/2,Cout] int8.
    """
    bsz, h, wdt, cin = x.shape
    cw = w1.shape[1]
    cout = w3.shape[1]
    h_out, w_out = h // 2, wdt // 2
    row_chunk = min(row_chunk, h_out)
    assert h_out % row_chunk == 0, (h_out, row_chunk)
    cmax = max(cw, cout)

    def row(v):
        v = v.astype(jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    scales = jnp.stack([
        row(a1), row(b1), row(a2), row(b2), row(a3), row(b3), row(ad), row(bd),
    ])
    kern = functools.partial(
        _qblock_s2_kernel, height=h, width=wdt, cin=cin, cw=cw, cout=cout,
        row_chunk=row_chunk,
    )
    flops = 2 * bsz * (h * wdt * cin * cw + h_out * w_out * (9 * cw * cw + cw * cout + cin * cout))
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cw), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cw, cw), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cmax), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h_out, w_out, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size + bsz * h_out * w_out * cout,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, w1, w2, w3, wd, scales)


def qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3, *,
                short_mul=None, wd=None, ad=None, bd=None,
                row_chunk: int = 16, interpret: bool = False):
    """Fused stride-1 bottleneck block.

    x [B,H,W,Cin] int8; w1 [Cin,Cw], w2 [3,3,Cw,Cw], w3 [Cw,Cout] int8;
    a*/b* f32 per-channel epilogue vectors.  Identity shortcut: pass
    ``short_mul`` (f32 scalar s_in/s_out, requires Cin == Cout).
    Projection shortcut: pass wd [Cin,Cout] int8 + ad/bd f32[Cout].
    """
    bsz, h, wdt, cin = x.shape
    cw = w1.shape[1]
    cout = w3.shape[1]
    has_ds = wd is not None
    row_chunk = min(row_chunk, h)
    assert h % row_chunk == 0, (h, row_chunk)
    if not has_ds:
        assert cin == cout and short_mul is not None
        wd = jnp.zeros((cin, cout), jnp.int8)
        ad = jnp.broadcast_to(jnp.asarray(short_mul, jnp.float32), (cout,))
        bd = jnp.zeros((cout,), jnp.float32)

    cmax = max(cw, cout)

    def row(v, n):
        v = v.astype(jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cmax - v.shape[0]))

    scales = jnp.stack([
        row(a1, cw), row(b1, cw), row(a2, cw), row(b2, cw),
        row(a3, cout), row(b3, cout), row(ad, cout), row(bd, cout),
    ])  # [8, cmax] f32

    kern = functools.partial(
        _qblock_kernel, height=h, width=wdt, cin=cin, cw=cw, cout=cout,
        row_chunk=row_chunk, has_ds=has_ds,
    )
    flops = 2 * bsz * h * wdt * (cin * cw + 9 * cw * cw + cw * cout + (cin * cout if has_ds else 0))
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, cin), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cw), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cw, cw), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cmax), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size + bsz * h * wdt * cout + w2.size + w1.size + w3.size,
            transcendentals=0,
        ),
        # stage1 blocks double-buffer 4MB in + 4MB out; v5e has headroom
        # beyond the 16MB default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, w1, w2, w3, wd, scales)
