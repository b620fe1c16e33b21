"""Fused stem tail: BN + ReLU + 3x3/2 maxpool + int8 quantize in one pass.

After the stem conv (left to XLA — its 7x7 conv emitter is already good),
the bf16 [B,256,256,64] activation is the largest tensor in the network.
The unfused XLA schedule spends ~6.8 ms/iter at B=64 on it (BN+ReLU fusion
with a layout transpose, reduce-window maxpool, quantize pass — each a full
HBM round-trip).  This kernel reads it once and writes the pooled int8
[B,128,128,64] once (~0.6 GB vs ~2.3 GB of traffic).

Pooling note: padding contributes 0 to the max, which is exact here because
the pool input is post-ReLU (>= 0), so a zero pad can never win a window
that contains any real value — and border windows always contain one.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_tail_kernel(x_ref, sc_ref, out_ref, *, height, width, ch, row_chunk):
    mult = sc_ref[0]      # [ch] f32: folded BN scale
    shift = sc_ref[1]     # [ch] f32: folded BN shift
    inv_s = sc_ref[2]     # [ch] f32: 1 / stem activation scale (broadcast)

    h_out, w_out = height // 2, width // 2
    mult_b = mult.astype(jnp.bfloat16)
    shift_b = shift.astype(jnp.bfloat16)
    for p0 in range(0, h_out, row_chunk):
        # pool row p = max over conv rows 2p-1, 2p, 2p+1 (pad row -1 is zero,
        # exact post-ReLU).  Pair-reduce: halve each axis first, then one
        # shifted max — touches ~1/4 the data of a pad-and-slice scheme.
        r_lo = 2 * p0
        nrows = 2 * row_chunk
        t = x_ref[0, r_lo:r_lo + nrows]
        t = jnp.maximum(t * mult_b + shift_b, 0)  # BN + ReLU, bf16
        # horizontal: a = max(col 2q, 2q+1); prev_odd = col 2q-1
        pairs = t.reshape(nrows, w_out, 2, ch)
        a = jnp.max(pairs, axis=2)              # [2RC, w_out, ch]
        odd = pairs[:, :, 1, :]                 # cols 2q+1
        prev_odd = jnp.concatenate(
            [jnp.zeros((nrows, 1, ch), jnp.bfloat16), odd[:, : w_out - 1, :]], axis=1
        )                                       # cols 2q-1
        hmax = jnp.maximum(a, prev_odd)         # [2RC, w_out, ch]
        # vertical: same trick over rows; row 2p-1 comes from the previous
        # pair's odd row (first chunk row needs the row above the chunk)
        vpairs = hmax.reshape(row_chunk, 2, w_out, ch)
        va = jnp.max(vpairs, axis=1)            # rows 2p, 2p+1
        vodd = vpairs[:, 1]                     # rows 2p+1
        if p0 == 0:
            above = jnp.zeros((1, w_out, ch), jnp.bfloat16)
        else:
            tprev = x_ref[0, r_lo - 1:r_lo]     # conv row 2p0-1
            tprev = jnp.maximum(tprev * mult_b + shift_b, 0)
            ppairs = tprev.reshape(1, w_out, 2, ch)
            pa = jnp.max(ppairs, axis=2)
            podd = jnp.concatenate(
                [jnp.zeros((1, 1, ch), jnp.bfloat16), ppairs[:, : w_out - 1, 1, :]], axis=1
            )
            above = jnp.maximum(pa, podd)       # hmax of row 2p0-1
        prev_vodd = jnp.concatenate([above, vodd[: row_chunk - 1]], axis=0)
        pooled = jnp.maximum(va, prev_vodd)     # [RC, w_out, ch]
        q = jnp.clip(jnp.round(pooled.astype(jnp.float32) * inv_s), -127.0, 127.0)
        out_ref[0, p0:p0 + row_chunk] = q.astype(jnp.int8)


def stem_bn_pool_quant(x, mult, shift, act_scale_val, *, row_chunk: int = 16,
                       interpret: bool = False):
    """bf16 stem-conv output [B,H,W,64] -> int8 [B,H/2,W/2,64].

    mult/shift: folded frozen-BN scale/shift (f32[64]); act_scale_val: the
    calibrated stem activation scale (f32 scalar).
    """
    bsz, h, w, ch = x.shape
    scales = jnp.stack([
        mult.astype(jnp.float32),
        shift.astype(jnp.float32),
        jnp.broadcast_to(1.0 / jnp.asarray(act_scale_val, jnp.float32), (ch,)),
    ])
    kern = functools.partial(_stem_tail_kernel, height=h, width=w, ch=ch, row_chunk=row_chunk)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, ch), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ch), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, w // 2, ch), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h // 2, w // 2, ch), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=x.size * 6, bytes_accessed=x.size * 2 + x.size // 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, scales)
