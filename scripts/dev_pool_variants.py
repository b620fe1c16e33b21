"""Measure XLA int8 3x3/2 maxpool variants on the stem shape (B=64).

reduce_window was measured ~5x off its bandwidth floor (2.1 ms for 268 MB).
Variants here decompose the overlapping pool into reshape-pair maxes +
shifted adds that XLA can fuse.
"""
from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, W, C = 64, 256, 256, 64
LOGDIR = "/tmp/jax-trace-pool"
ITERS = 8


def pool_rw(x):
    return jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def pool_decomp(x):
    """3x3/2 overlapping max via pair-reshape maxes + one shifted max per
    axis: m[q] = max(E[q], O[q-1]) with E=max(x2q,x2q+1), O=x2q+1."""
    b, h, w, c = x.shape

    def axis_pool(y, axis):
        n = y.shape[axis]
        shp = list(y.shape)
        shp[axis:axis + 1] = [n // 2, 2]
        yp = y.reshape(shp)
        e = jnp.max(yp, axis=axis + 1)  # max(x[2q], x[2q+1])
        o = jax.lax.index_in_dim(yp, 1, axis + 1, keepdims=False)  # x[2q+1]
        pad_cfg = [(0, 0)] * o.ndim
        pad_cfg[axis] = (1, 0)
        o_shift = jnp.pad(o, pad_cfg, constant_values=jnp.int8(-128))
        o_shift = jax.lax.slice_in_dim(o_shift, 0, n // 2, axis=axis)
        return jnp.maximum(e, o_shift)

    y = axis_pool(x, 1)
    return axis_pool(y, 2)


def pool_2pass(x):
    """Separable: rows pass then cols pass via reduce_window."""
    y = jax.lax.reduce_window(
        x, jnp.int8(-128), jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        [(0, 0), (1, 1), (0, 0), (0, 0)],
    )
    return jax.lax.reduce_window(
        y, jnp.int8(-128), jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        [(0, 0), (0, 0), (1, 1), (0, 0)],
    )


def pool_decomp_bf16(x):
    y = pool_decomp_generic(x.astype(jnp.bfloat16), -jnp.inf)
    return y.astype(jnp.int8)


def pool_decomp_generic(x, neg):
    def axis_pool(y, axis):
        n = y.shape[axis]
        shp = list(y.shape)
        shp[axis:axis + 1] = [n // 2, 2]
        yp = y.reshape(shp)
        e = jnp.max(yp, axis=axis + 1)
        o = jax.lax.index_in_dim(yp, 1, axis + 1, keepdims=False)
        pad_cfg = [(0, 0)] * o.ndim
        pad_cfg[axis] = (1, 0)
        o_shift = jnp.pad(o, pad_cfg, constant_values=neg)
        o_shift = jax.lax.slice_in_dim(o_shift, 0, n // 2, axis=axis)
        return jnp.maximum(e, o_shift)

    return axis_pool(axis_pool(x, 1), 2)


def main():
    x = jax.random.randint(jax.random.PRNGKey(0), (B, H, W, C), -127, 128, jnp.int8)
    fns = {"reduce_window": pool_rw, "decomp": pool_decomp, "2pass": pool_2pass, "decomp_bf16": pool_decomp_bf16}
    jits = {k: jax.jit(f) for k, f in fns.items()}
    ref = None
    for k, f in jits.items():
        out = f(x)
        if ref is None:
            ref = out
        else:
            assert bool((out == ref).all()), f"{k} mismatch"
    print("all variants agree")

    jax.profiler.start_trace(LOGDIR)
    outs = []
    for k, f in jits.items():
        for _ in range(ITERS):
            outs.append(f(x))
    jax.block_until_ready(outs)
    float(outs[-1].astype(jnp.float32).sum())
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        agg = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                agg[name.split("(")[0]] += ev.duration_ps / 1e9 / ITERS
        for n, ms in agg.most_common():
            print(f"{ms:8.3f} ms  {n[:60]}")


if __name__ == "__main__":
    main()
