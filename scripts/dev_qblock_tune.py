"""Row-chunk sweep for the stage-1 qbottleneck shape (the HBM-heaviest
blocks).  Usage: python scripts/dev_qblock_tune.py [batch]"""
from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOGDIR = "/tmp/jax-trace-qblock"
ITERS = 8


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from pytorch_object_detection_tpu.ops.pallas_qblock import qbottleneck

    rng = np.random.default_rng(0)
    H, W, Cin, Cw, Cout = 128, 128, 256, 64, 256
    x = jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)).astype(np.int8))
    w1 = jnp.asarray(rng.integers(-8, 8, (Cin, Cw)).astype(np.int8))
    w2 = jnp.asarray(rng.integers(-8, 8, (3, 3, Cw, Cw)).astype(np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, (Cw, Cout)).astype(np.int8))
    mk = lambda n, s: jnp.asarray(np.abs(rng.standard_normal(n)).astype(np.float32)) * s
    a1, b1 = mk(Cw, 1e-3), mk(Cw, .1)
    a2, b2 = mk(Cw, 1e-3), mk(Cw, .1)
    a3, b3 = mk(Cout, 1e-3), mk(Cout, .1)

    def make(rc):
        def f(x):
            return qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                               short_mul=0.9, row_chunk=rc).astype(jnp.int32).sum()
        f.__name__ = f"rc{rc}"
        return jax.jit(f)

    runs = {}
    for rc in (8, 16, 32, 64):
        runs[rc] = make(rc)
        float(runs[rc](x))

    jax.profiler.start_trace(LOGDIR)
    chk = None
    for rc, f in runs.items():
        for _ in range(ITERS):
            chk = f(x)
    float(chk)
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
