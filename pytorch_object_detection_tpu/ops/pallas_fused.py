"""Pallas fused matmul + BN/residual/ReLU epilogue (TPU).

The XLA lowering of a ResNet bottleneck keeps the residual add + ReLU as a
separate elementwise fusion after the conv3 output is written to HBM — one
extra full write+read of the widest activation per block (~8 ms/batch-64 at
512px across ResNet-50).  Since conv3 is a 1x1 stride-1 conv, it IS a
matmul: this kernel computes

    out = act( (x @ w) * scale + shift (+ residual) )

in one pass — the MXU product accumulates in VMEM and the epilogue (folded
frozen-BN scale/shift, residual add, ReLU) applies before the single output
write.  Used by nn/fused_resnet.py for inference; exact vs the unfused path
(tested in interpret mode and on device).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_res(x_ref, w_ref, sc_ref, sh_ref, res_ref, o_ref, *, act: bool):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    out = acc * sc_ref[...] + sh_ref[...]
    out = out + res_ref[...].astype(jnp.float32)
    if act:
        out = jnp.maximum(out, 0.0)
    o_ref[...] = out.astype(o_ref.dtype)


def _kernel_nores(x_ref, w_ref, sc_ref, sh_ref, o_ref, *, act: bool):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    out = acc * sc_ref[...] + sh_ref[...]
    if act:
        out = jnp.maximum(out, 0.0)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "block_m", "block_n", "interpret")
)
def matmul_bn_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    act: bool = True,
    block_m: int = 512,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """``act((x @ w) * scale + shift (+ residual))`` in one fused kernel.

    x ``[M, K]`` (M a multiple of block_m — callers pad), w ``[K, N]``,
    scale/shift ``[N]`` fp32, residual ``[M, N]`` or None.  Output dtype
    follows x.  K and N must be 128-multiples (ResNet channels are).
    """
    m, k = x.shape
    n = w.shape[1]
    bm = min(block_m, m)
    bn = min(block_n, n)
    # k/n below 128 are Mosaic-padded to a lane (fine for ResNet's 64-ch stage)
    assert m % bm == 0 and n % bn == 0, (m, k, n)

    grid = (m // bm, n // bn)
    x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)

    scale2 = scale.reshape(1, n).astype(jnp.float32)
    shift2 = shift.reshape(1, n).astype(jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * m * n * k, bytes_accessed=(m * k + k * n + m * n) * 2, transcendentals=0
    )
    if residual is not None:
        return pl.pallas_call(
            functools.partial(_kernel_res, act=act),
            grid=grid,
            in_specs=[x_spec, w_spec, v_spec, v_spec, o_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x, w, scale2, shift2, residual)
    return pl.pallas_call(
        functools.partial(_kernel_nores, act=act),
        grid=grid,
        in_specs=[x_spec, w_spec, v_spec, v_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w, scale2, shift2)


def conv1x1_bn_act(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    act: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """1x1 stride-1 conv (+BN epilogue, +residual, +ReLU) as the fused matmul.

    x ``[B, H, W, K]``; kernel ``[1, 1, K, N]`` (flax layout).
    """
    b, h, w_, k = x.shape
    n = kernel.shape[-1]
    m = b * h * w_
    x2 = x.reshape(m, k)
    r2 = residual.reshape(m, n) if residual is not None else None
    # pick a block_m that divides M (M = B*H*W with H,W powers of two here)
    bm = 512
    while m % bm != 0:
        bm //= 2
    out = matmul_bn_act(
        x2, kernel.reshape(k, n), scale, shift, r2, act, block_m=bm, interpret=interpret
    )
    return out.reshape(b, h, w_, n)
