"""Sweep the qbottleneck band count at the COCO stage-1 merged shape
(32x112x352, Cin=512 merged) — does the stem's smaller-window finding
(56-row bands 0.96 ms faster than 112-row at the COCO canvas) transfer
to the bottleneck grid?  r3 shipped nb=4 (112/4=28-row bands) from the
40 MB budget; this measures nb in {1,2,4,8,14} trace-timed.

Usage: python scripts/dev_qb_bands.py
"""
from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOGDIR = "/tmp/jax-trace-qb-bands"
ITERS = 8


def main():
    from pytorch_object_detection_tpu.ops.pallas_qblock import qbottleneck

    rng = np.random.default_rng(0)
    Cin, Cw = 512, 128
    w1 = jnp.asarray(rng.integers(-8, 8, (Cin, Cw)).astype(np.int8))
    w2 = jnp.asarray(rng.integers(-8, 8, (3, 3, Cw, Cw)).astype(np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, (Cw, Cin)).astype(np.int8))
    mk = lambda n, s: jnp.asarray(np.abs(rng.standard_normal(n)).astype(np.float32)) * s
    a1, b1 = mk(Cw, 1e-3), mk(Cw, .1)
    a2, b2 = mk(Cw, 1e-3), mk(Cw, .1)
    a3, b3 = mk(Cin, 1e-3), mk(Cin, .1)

    x = jnp.asarray(rng.integers(-127, 128, (32, 112, 352, Cin)).astype(np.int8))

    def make(name, nb):
        def f(x):
            return qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                               short_mul=0.9, bands=nb).astype(jnp.int32).sum()
        f.__name__ = name
        jf = jax.jit(f)
        float(jf(x))
        return jf

    runs = [(f"nb{nb}", make(f"nb{nb}", nb), nb) for nb in (1, 2, 4, 8, 14)]

    jax.profiler.start_trace(LOGDIR)
    chk = 0.0
    for name, jf, nb in runs:
        for _ in range(ITERS):
            chk = jf(x)
    float(chk)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    per = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                op = name.split(" = ")[0].lstrip("%")
                per[op] += ev.duration_ps / 1e9 / ITERS
    for op, ms in sorted(per.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{ms:8.3f} ms  {op}")


if __name__ == "__main__":
    main()
