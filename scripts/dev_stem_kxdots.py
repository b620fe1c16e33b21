"""Trace-based A/B of the stem kernel im2col forms: 16-piece (ky,kx)
im2col + one K=512 dot (r2/r3 shipped) vs kx-only im2col + 4 accumulating
K=128 ky-tap dots (r3 v2, `kxdots=True`).

Usage: python scripts/dev_stem_kxdots.py [batch] [raw]
Then:  python scripts/dev_xplane_agg.py /tmp/trace-stem-<name> 6 10
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    raw = len(sys.argv) > 2 and sys.argv[2] == "raw"
    HS = WS = 256
    rng = np.random.default_rng(0)
    from pytorch_object_detection_tpu.ops.pallas_qstem import (
        COUT, KTAP, S2D_C, qstem_conv)

    if raw:
        xs = jnp.asarray(
            rng.integers(0, 256, (B, HS, 2, WS, S2D_C // 2)).astype(np.uint8))
    else:
        xs = jnp.asarray(rng.integers(0, 256, (B, HS, WS, S2D_C)).astype(np.uint8))
    w2d = jnp.asarray(
        rng.integers(-16, 16, (KTAP * KTAP * S2D_C, COUT)).astype(np.int8))
    a = jnp.asarray(np.abs(rng.standard_normal(COUT)).astype(np.float32) * 1e-3)
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32) * .1)
    pv = jnp.asarray(rng.integers(-5, 5, (S2D_C,)).astype(np.int8))

    fns = {
        "old": jax.jit(lambda x: qstem_conv(
            x, w2d, a, b, pv, pool=True, emit_merged=True, raw=raw,
            kxdots=False).sum(dtype=jnp.int32)),
        "kxdots": jax.jit(lambda x: qstem_conv(
            x, w2d, a, b, pv, pool=True, emit_merged=True, raw=raw,
            kxdots=True).sum(dtype=jnp.int32)),
    }
    vals = {}
    for name, fn in fns.items():
        vals[name] = int(fn(xs))  # compile+warm
        jax.profiler.start_trace(f"/tmp/trace-stem-{name}")
        chks = [fn(xs) for _ in range(6)]
        float(chks[-1])
        jax.profiler.stop_trace()
        print("traced", name, "checksum", vals[name])
    assert vals["old"] == vals["kxdots"], vals


if __name__ == "__main__":
    main()
