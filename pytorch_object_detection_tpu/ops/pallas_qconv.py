"""Pallas int8 conv kernels with fused requantize epilogues (TPU MXU).

Why these exist: XLA runs int8 convs on the MXU but will not fuse the
dequant + bias + residual + ReLU + requant chain into the conv output, so
every layer round-trips an int32 accumulator through HBM (4 bytes/elem
written + read, vs 1 byte of int8 payload).  Profiling the XLA int8
backbone showed those `clamp_convert` fusions costing ~2x the conv time
itself.  Here the epilogue runs in VMEM on the conv's accumulator tile and
only int8 ever touches HBM.

Two kernels cover the ResNet bottleneck:
  * :func:`qmatmul` — 1x1 convs as [M,K]x[K,N] int8 matmul with optional
    int8 residual add (the conv3 + shortcut + ReLU + requant fusion that
    eliminates the residual elementwise pass entirely).
  * :func:`qconv3x3` — stride-1 3x3 conv; the whole (pre-padded) image
    rides in VMEM per batch element and nine shifted int8 dots accumulate
    the window sum (no im2col materialization).

Epilogue math (per out-channel A, B precomputed at quantization time,
see nn/resnet_int8.quantize_resnet50):
    y    = acc_i32 * A + B [+ res_i8 * res_scale]
    outq = clip(round(relu?(y)), -127, 127) -> int8

Replaces the hot path of the reference's fp32 eval conv stack
(`/root/reference/model/backbone/resnet50.py`); design per the TPU Pallas
quantization-kernel pattern (int8 min tile (32,128), MXU s8xs8->s32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc_i32, a_row, b_row, relu: bool, res=None, res_scale=None):
    y = acc_i32.astype(jnp.float32) * a_row + b_row
    if res is not None:
        y = y + res.astype(jnp.float32) * res_scale
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


# ---------------------------------------------------------------- 1x1 conv


def _qmm_kernel(x_ref, w_ref, a_ref, b_ref, out_ref, *, relu):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] = _epilogue(acc, a_ref[:], b_ref[:], relu)


def _qmm_res_kernel(x_ref, w_ref, a_ref, b_ref, res_ref, rs_ref, out_ref, *, relu):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out_ref[:] = _epilogue(acc, a_ref[:], b_ref[:], relu, res_ref[:], rs_ref[0, 0])


def qmatmul(x, w, a, b, *, relu=True, res=None, res_scale=None,
            tile_m: int = 2048, tile_n: int = 256, interpret: bool = False):
    """int8 [M,K] x [K,N] -> int8 [M,N] with fused requant epilogue.

    a, b: f32[N] per-channel epilogue (see module docstring).
    res: optional int8 [M,N] residual added as res * res_scale (f32 scalar).
    """
    m, k = x.shape
    n = w.shape[1]
    tile_m = min(tile_m, m)
    tile_n = min(tile_n, n)
    pad_m = (-m) % tile_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
        if res is not None:
            res = jnp.pad(res, ((0, pad_m), (0, 0)))
    gm, gn = (m + pad_m) // tile_m, n // tile_n
    a2 = a.astype(jnp.float32).reshape(1, n)
    b2 = b.astype(jnp.float32).reshape(1, n)

    x_spec = pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ab_spec = pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * (m + pad_m) * k * n,
        bytes_accessed=(m + pad_m) * k + k * n + (m + pad_m) * n * (2 if res is not None else 1),
        transcendentals=0,
    )

    if res is None:
        out = pl.pallas_call(
            functools.partial(_qmm_kernel, relu=relu),
            grid=(gm, gn),
            in_specs=[x_spec, w_spec, ab_spec, ab_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m + pad_m, n), jnp.int8),
            cost_estimate=cost,
            interpret=interpret,
        )(x, w, a2, b2)
    else:
        rs = jnp.asarray(res_scale, jnp.float32).reshape(1, 1)
        rs_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            functools.partial(_qmm_res_kernel, relu=relu),
            grid=(gm, gn),
            in_specs=[x_spec, w_spec, ab_spec, ab_spec, out_spec, rs_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m + pad_m, n), jnp.int8),
            cost_estimate=cost,
            interpret=interpret,
        )(x, w, a2, b2, res, rs)
    return out[:m] if pad_m else out


def qconv1x1(x_nhwc, w_hwio, a, b, *, relu=True, res_nhwc=None, res_scale=None,
             interpret: bool = False):
    """1x1 conv wrapper: NHWC int8 -> NHWC int8 via the fused matmul."""
    bsz, h, wd, cin = x_nhwc.shape
    cout = w_hwio.shape[-1]
    x2 = x_nhwc.reshape(bsz * h * wd, cin)
    r2 = None if res_nhwc is None else res_nhwc.reshape(bsz * h * wd, cout)
    y = qmatmul(x2, w_hwio.reshape(cin, cout), a, b, relu=relu, res=r2,
                res_scale=res_scale, interpret=interpret)
    return y.reshape(bsz, h, wd, cout)


# ---------------------------------------------------------------- 3x3 conv


def _qc3_kernel(x_ref, w_ref, a_ref, b_ref, out_ref, *, tile_h, width, cin, tile_n):
    h0 = pl.program_id(2) * tile_h
    rows = x_ref[0, pl.ds(h0, tile_h + 2)]  # [tile_h+2, width+2, cin]
    acc = jnp.zeros((tile_h * width, tile_n), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            win = rows[ky:ky + tile_h, kx:kx + width, :].reshape(tile_h * width, cin)
            acc = acc + jax.lax.dot_general(
                win, w_ref[ky, kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    out = _epilogue(acc, a_ref[:], b_ref[:], relu=True)
    out_ref[0] = out.reshape(tile_h, width, tile_n)


def qconv3x3(x_nhwc, w_hwio, a, b, *, tile_h: int = 16, tile_n: int = 256,
             interpret: bool = False):
    """Stride-1 SAME 3x3 conv, int8 -> int8, ReLU epilogue.

    The padded image [H+2, W+2, Cin] stays resident in VMEM across the row
    and Cout grid steps (index map constant in those dims), so HBM sees each
    activation exactly once.
    """
    bsz, h, wd, cin = x_nhwc.shape
    cout = w_hwio.shape[-1]
    tile_n = min(tile_n, cout)
    tile_h = min(tile_h, h)
    assert h % tile_h == 0 and cout % tile_n == 0, (h, tile_h, cout, tile_n)
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    a2 = a.astype(jnp.float32).reshape(1, cout)
    b2 = b.astype(jnp.float32).reshape(1, cout)

    grid = (bsz, cout // tile_n, h // tile_h)
    out = pl.pallas_call(
        functools.partial(_qc3_kernel, tile_h=tile_h, width=wd, cin=cin, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, cin), lambda bi, ni, hi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, tile_n), lambda bi, ni, hi: (0, 0, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda bi, ni, hi: (0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda bi, ni, hi: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wd, tile_n), lambda bi, ni, hi: (bi, hi, 0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * cin * cout * 9,
            bytes_accessed=bsz * (h + 2) * (wd + 2) * cin + 9 * cin * cout + bsz * h * wd * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_hwio, a2, b2)
    return out
