"""Trace-based A/B of the Pallas fused stem vs XLA's native int8 conv."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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

    pallas_fn = jax.jit(lambda x: qstem_conv(x, w2d, a, b, pv, pool=True,
                                             emit_merged=True).sum(dtype=jnp.int32))

    def xfull(x):
        v = (x.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            v, w4d, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * a + b, 0.0)
        q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        q = jax.lax.reduce_window(q, jnp.int8(-128), jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])
        return q.sum(dtype=jnp.int32)

    xla_fn = jax.jit(xfull)
    for name, fn in [("pallas", pallas_fn), ("xla", xla_fn)]:
        float(fn(xs))  # compile+warm
        jax.profiler.start_trace(f"/tmp/trace-stem-{name}")
        chks = [fn(xs) for _ in range(6)]
        float(chks[-1])
        jax.profiler.stop_trace()
        print("traced", name)


if __name__ == "__main__":
    main()
