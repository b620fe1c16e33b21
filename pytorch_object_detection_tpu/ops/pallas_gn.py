"""Fused GroupNorm(+activation) Pallas kernel.

GroupNorm dominates the detection head's eval time (trace: ~9 ms/iter of a
~45 ms B=64 iteration): XLA schedules it as a stats-reduction pass plus a
normalize pass plus the following activation — three HBM round-trips over
the P3-level tensors.  Here the per-image feature map stays in VMEM: one
read, stats in-register, one write of the activated result.

Matches flax `nn.GroupNorm(num_groups, epsilon)` semantics: groups are
channel-contiguous on the last axis, biased variance, f32 statistics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, sb_ref, out_ref, *, height, width, ch, groups, eps, act, row_chunk):
    cg = ch // groups
    n = height * width * cg  # elements per group

    # Mosaic can't reshape the lane (channel) dim, so the channel->group
    # reduction and the group->channel broadcast both ride tiny MXU dots
    # against a 0/1 membership matrix.
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (ch, groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (ch, groups), 1)
    member = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]

    sums_c = jnp.zeros((1, ch), jnp.float32)
    sq_c = jnp.zeros((1, ch), jnp.float32)
    for r0 in range(0, height, row_chunk):
        t = x_ref[0, r0:r0 + row_chunk].astype(jnp.float32).reshape(
            row_chunk * width, ch)
        sums_c = sums_c + t.sum(axis=0, keepdims=True)
        sq_c = sq_c + (t * t).sum(axis=0, keepdims=True)
    sums = jnp.dot(sums_c, member, preferred_element_type=jnp.float32)  # [1, G]
    sq = jnp.dot(sq_c, member, preferred_element_type=jnp.float32)
    mean = sums / n
    var = sq / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # [1, G]

    # group -> channel broadcast (consecutive: channel c -> group c//cg)
    mean_c = jnp.dot(mean, member.T, preferred_element_type=jnp.float32)  # [1, C]
    inv_c = jnp.dot(inv, member.T, preferred_element_type=jnp.float32)
    scale_c = sb_ref[0].reshape(1, ch)
    bias_c = sb_ref[1].reshape(1, ch)
    mul = inv_c * scale_c
    add = bias_c - mean_c * mul

    for r0 in range(0, height, row_chunk):
        t = x_ref[0, r0:r0 + row_chunk].astype(jnp.float32).reshape(
            row_chunk * width, ch)
        y = t * mul + add
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "silu":
            y = y * jax.nn.sigmoid(y)
        out_ref[0, r0:r0 + row_chunk] = y.astype(out_ref.dtype).reshape(
            row_chunk, width, ch)


def groupnorm_act(x, scale, bias, *, groups: int = 32, eps: float = 1e-5,
                  act: str = "none", row_chunk: int = 0, interpret: bool = False):
    """GroupNorm + optional relu/silu, one HBM read + one write.

    x [B,H,W,C]; scale/bias [C].  Output dtype follows x.
    """
    bsz, h, w, ch = x.shape
    assert ch % groups == 0
    if row_chunk <= 0:
        row_chunk = max(1, min(h, (256 * 1024) // max(1, w * ch // 128)))
        while h % row_chunk:
            row_chunk -= 1
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
    kern = functools.partial(
        _gn_kernel, height=h, width=w, ch=ch, groups=groups, eps=eps, act=act,
        row_chunk=row_chunk,
    )
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, ch), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ch), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ch), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=x.size * 8, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size if act == "silu" else 0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, sb)
