"""Decompose the stem kernel's cost: conv-only vs fused-pool epilogue,
raw 5D-view input vs pre-s2d input.

Usage: python scripts/dev_stem_parts.py [batch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def trace_ms(fn, xs, name):
    fn(xs).block_until_ready()
    float(fn(xs))
    jax.profiler.start_trace(f"/tmp/trace-sp-{name}")
    chks = [fn(xs) for _ in range(6)]
    float(chks[-1])
    jax.profiler.stop_trace()
    import collections
    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    path = sorted(glob.glob(f"/tmp/trace-sp-{name}/**/*.xplane.pb", recursive=True))[-1]
    xsp = xplane_pb2.XSpace()
    xsp.ParseFromString(open(path, "rb").read())
    for plane in xsp.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        tot = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                if "lambda" in nm or "qstem" in nm:
                    tot += ev.duration_ps
        print(f"{name}: kernel {tot / 6 / 1e9:.3f} ms/iter")
        return


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    HS = WS = 256
    rng = np.random.default_rng(0)
    from pytorch_object_detection_tpu.ops.pallas_qstem import (
        COUT, KTAP, S2D_C, qstem_conv)

    xraw = jnp.asarray(
        rng.integers(0, 256, (B, HS, 2, WS, S2D_C // 2)).astype(np.uint8))
    xs2d = jnp.asarray(rng.integers(0, 256, (B, HS, WS, S2D_C)).astype(np.uint8))
    w2d = jnp.asarray(
        rng.integers(-16, 16, (KTAP * KTAP * S2D_C, COUT)).astype(np.int8))
    a = jnp.asarray(np.abs(rng.standard_normal(COUT)).astype(np.float32) * 1e-3)
    b = jnp.asarray(rng.standard_normal(COUT).astype(np.float32) * .1)
    pv = jnp.asarray(rng.integers(-5, 5, (S2D_C,)).astype(np.int8))

    cases = [
        ("raw-pool-kx", xraw, dict(pool=True, emit_merged=True, raw=True, kxdots=True)),
        ("raw-conv-kx", xraw, dict(pool=False, raw=True, kxdots=True)),
        ("s2d-pool-kx", xs2d, dict(pool=True, emit_merged=True, kxdots=True)),
        ("s2d-conv-kx", xs2d, dict(pool=False, kxdots=True)),
        ("s2d-conv-old", xs2d, dict(pool=False, kxdots=False)),
    ]
    for name, xs, kw in cases:
        fn = jax.jit(lambda x, kw=kw: qstem_conv(
            x, w2d, a, b, pv, **kw).sum(dtype=jnp.int32))
        trace_ms(fn, xs, name)


if __name__ == "__main__":
    main()
