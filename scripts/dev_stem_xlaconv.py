"""Probe: XLA's native int8 conv for the s2d stem vs the Pallas stem kernel.

Times three jitted programs at B=128, 512^2, pipelined-fetch wall clock:
  a) current fused Pallas stem (conv+BN+ReLU+requant+pool, merged emit)
  b) XLA int8 4x4 conv (s8 x s8 -> s32) + requant epilogue (no pool)
  c) b + int8 reduce_window pool (the full XLA stem tail)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(x.reshape(-1)[0]), out)  # warm
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        chk = jax.tree_util.tree_leaves(out)[0]
        if prev is not None:
            float(prev.reshape(-1)[0].astype(jnp.float32))
        prev = chk
    float(prev.reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    HS = WS = 256
    rng = np.random.default_rng(0)
    from pytorch_object_detection_tpu.ops.pallas_qstem import COUT, KTAP, S2D_C, qstem_conv

    xs = jnp.asarray(rng.integers(0, 256, (B, HS, WS, S2D_C)).astype(np.uint8))
    w2d = jnp.asarray(rng.integers(-16, 16, (KTAP * KTAP * S2D_C, COUT)).astype(np.int8))
    w4d = w2d.reshape(KTAP, KTAP, S2D_C, COUT)
    a = jnp.asarray(np.abs(rng.standard_normal(COUT)).astype(np.float32) * 1e-3)
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32) * .1)
    pv = jnp.asarray(rng.integers(-5, 5, (S2D_C,)).astype(np.int8))

    pallas_fn = jax.jit(lambda x: qstem_conv(x, w2d, a, b, pv, pool=True, emit_merged=True))
    print("pallas fused stem:", round(timeit(pallas_fn, xs), 2), "ms")

    def xconv(x):
        v = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            v, w4d, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * a + b, 0.0)
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    xconv_fn = jax.jit(xconv)
    print("xla int8 conv+requant:", round(timeit(xconv_fn, xs), 2), "ms")

    def xfull(x):
        q = xconv(x)
        return jax.lax.reduce_window(q, jnp.int8(-128), jax.lax.max,
                                     (1, 3, 3, 1), (1, 2, 2, 1),
                                     [(0, 0), (1, 1), (1, 1), (0, 0)])
    print("xla conv+requant+pool:", round(timeit(jax.jit(xfull), xs), 2), "ms")


if __name__ == "__main__":
    main()
