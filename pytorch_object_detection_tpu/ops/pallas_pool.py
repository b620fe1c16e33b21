"""Fused int8 2x2/2 maxpool (TPU Pallas).

XLA's int8 ``reduce_window`` runs ~10x off its bandwidth floor on v5e
(six instances cost ~2.5 ms at B=128 in the int8 eval pipeline — trace
r3; the same weakness previously motivated fusing the stem pool,
ops/pallas_qstem).  This kernel does the whole pool in one VMEM pass at
full 128-lane width:

  * the stride-2 column subsample is the proven lane-merge reshape
    [H, W, C] -> [H, W/2, 2C] (PERF.md "lane-merge subsample") — the
    max then runs between the two aligned C-lane halves;
  * int8 ``jnp.maximum`` does not legalize in Mosaic (arith.maxsi), so
    the maxes run in bf16 — exact for int8 values (|x| <= 127 < 2^8);
  * the stride-2 row subsample is a free outer-dim split
    [H, W/2, C] -> [H/2, 2, W/2, C] + max over the pair.

Matches ``jax.lax.reduce_window(x, -128, max, (1,2,2,1), (1,2,2,1),
"VALID")`` bit-exactly (tests/test_quant.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qpool_kernel(x_ref, o_ref, *, h, w, c):
    x = x_ref[0]  # [H, W, C] int8
    xm = x.reshape(h, w // 2, 2 * c)  # lanes = [col 2j | col 2j+1]
    cmax = jnp.maximum(xm[..., :c].astype(jnp.bfloat16),
                       xm[..., c:].astype(jnp.bfloat16))  # [H, W/2, C]
    r4 = cmax.reshape(h // 2, 2, w // 2, c)  # outer split: rows 2i | 2i+1
    o_ref[0] = jnp.maximum(r4[:, 0], r4[:, 1]).astype(jnp.int8)


def _qpool3_kernel(x_ref, o_ref, *, h, w, c, merged):
    neg = jnp.bfloat16(-128.0)
    # the column-pair lane merge happens OUTSIDE the kernel as a free
    # row-major XLA bitcast ([B,H,W,C] -> [B,H,W/2,2C]) — in-kernel it is
    # the rejected 64<->128-lane shape cast.  3-window needs col 2q-1
    # too: shift the materialized odd half by one pair (a sublane-concat
    # of a lane-OFFSET slice is the "offset mismatch" failure — qstem)
    xm = x_ref[0]  # [H, W/2, 2C], lanes [col 2q | 2q+1]
    ev = xm[..., :c].astype(jnp.bfloat16)
    od = xm[..., c:].astype(jnp.bfloat16)
    pmax = jnp.maximum(ev, od)
    # shift the FULL-width tensor, take the odd lane half after (concat of
    # a lane-offset slice is the "offset mismatch" rejection)
    xsf = jnp.concatenate(
        [jnp.full((h, 1, 2 * c), jnp.int8(-128), jnp.int8), xm[:, :-1]],
        axis=1)
    cmax = jnp.maximum(pmax, xsf[..., c:].astype(jnp.bfloat16))
    # stride-2 row subsample: outer split; 3-window needs row 2p-1
    r4 = cmax.reshape(h // 2, 2, w // 2, c)
    prev = jnp.concatenate(
        [jnp.full((1, w // 2, c), neg, jnp.bfloat16), r4[:-1, 1]], axis=0)
    out = jnp.maximum(jnp.maximum(r4[:, 0], r4[:, 1]), prev).astype(jnp.int8)
    if not merged:
        o_ref[0] = out
        return
    o4 = out.reshape(h // 4, 2, w // 2, c)
    o_ref[0] = jnp.concatenate([o4[:, 0], o4[:, 1]], axis=-1)


def qmaxpool3x3s2(x, *, emit_merged: bool = False, interpret: bool = False):
    """int8 3x3/2 maxpool, pad 1 (the resnet stem pool) in one VMEM pass;
    ``emit_merged=True`` writes the row-pair lane-merged layout
    ``[B, H/4, W/2, 2C]`` the merged stage-1 bottleneck kernels consume —
    replacing the XLA reduce_window + row_pair_merge transpose (4.5 ms of
    int8 copies at B=128, PERF.md r3 xla7 stem).

    Pad semantics: reduce_window pad (1,1) with -128 == this kernel's
    -inf fills (bit-exact, tested).  Falls back to XLA when the shape
    doesn't fit (odd dims, lane misalign, or whole-image VMEM overflow).
    """
    b, h, w, c = x.shape
    # block is the col-pair-merged view [1, h, w/2, 2c] (full lanes at c=64)
    physical = h * (w // 2) * max(2 * c, 128)
    if (h % 4 or w % 2 or c % 64 or x.dtype != jnp.int8
            or physical > 24 * 2**20):
        q = jax.lax.reduce_window(
            x, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        if not emit_merged:
            return q
        bq, hq, wq, cq = q.shape
        return q.reshape(bq, hq // 2, 2, wq, cq).transpose(0, 1, 3, 2, 4).reshape(
            bq, hq // 2, wq, 2 * cq)
    kern = functools.partial(_qpool3_kernel, h=h, w=w, c=c, merged=emit_merged)
    oh, ow, oc = ((h // 4, w // 2, 2 * c) if emit_merged
                  else (h // 2, w // 2, c))
    x = x.reshape(b, h, w // 2, 2 * c)  # free bitcast: col-pair lane merge
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w // 2, 2 * c), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, oh, ow, oc), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, oc), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c, bytes_accessed=x.size + x.size // 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 2**20),
        interpret=interpret,
    )(x)


def qmaxpool2x2(x, *, interpret: bool = False):
    """int8 [B, H, W, C] -> [B, H/2, W/2, C], 2x2 window stride 2 (VALID).

    Falls back to ``reduce_window`` when the shape doesn't fit the kernel
    (odd H/W, or C not lane-aligned).
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2 or c % 128 or x.dtype != jnp.int8:
        return jax.lax.reduce_window(
            x, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    # the 2x2/2 pool is row-pair-local (no halo), so large levels (COCO
    # canvas) band the grid over rows to bound VMEM
    hb = h
    while hb * w * c > 2**22 and hb % 2 == 0:  # per-BLOCK bytes, not batch
        nxt = hb // 2
        if nxt % 2 or h % nxt:
            break
        hb = nxt
    kern = functools.partial(_qpool_kernel, h=hb, w=w, c=c)
    return pl.pallas_call(
        kern,
        grid=(b, h // hb),
        in_specs=[pl.BlockSpec((1, hb, w, c), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb // 2, w // 2, c),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * c, bytes_accessed=x.size + x.size // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
