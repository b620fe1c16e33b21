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
