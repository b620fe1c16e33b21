"""Micro-bench the fused int8 head kernel on the P3 shape (the hot one).

Usage: python scripts/dev_qhead_bench.py [row_chunk] [batch]
Times via trace (wall clocks are tunnel-bound): prints device ms for N
iterations of just the P3-level kernel.
"""
from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOGDIR = "/tmp/jax-trace-qhead"
ITERS = 8


def main():
    rc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    C = 256
    from pytorch_object_detection_tpu.models.heads import HISHead
    from pytorch_object_detection_tpu.models.head_int8 import (
        calibrate_hishead,
        quantize_hishead,
    )
    from pytorch_object_detection_tpu.ops.pallas_qhead import qhishead_level

    head = HISHead(num_classes=20, features=C)
    sizes = (64, 32, 16, 8, 4)
    small = [jnp.zeros((1, s, s, C)) for s in sizes]
    v = jax.jit(head.init)(jax.random.PRNGKey(0), small)
    levels = [jax.random.normal(jax.random.PRNGKey(i), (2, s, s, C))
              for i, s in enumerate(sizes)]
    taps = {k: float(x) for k, x in jax.jit(calibrate_hishead)(v["params"], levels).items()}
    s_lv = [float(jnp.max(jnp.abs(l))) / 127.0 for l in levels]
    q = quantize_hishead(v["params"], taps, s_lv, 20)

    x = jax.random.randint(jax.random.PRNGKey(9), (B, 64, 64, C), -127, 128, jnp.int8)

    @jax.jit
    def run(q, lv, x):
        cls, cr = qhishead_level(q, lv, x, num_classes=20, row_chunk=rc)
        return cls.astype(jnp.float32).sum() + cr.astype(jnp.float32).sum()

    lv = q["levels"][0]
    float(run(q, lv, x))
    jax.profiler.start_trace(LOGDIR)
    chk = [run(q, lv, x) for _ in range(ITERS)]
    float(chk[-1])
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
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                op = name.split(" = ")[0].lstrip("%")
                agg[op] += ev.duration_ps / 1e9 / ITERS
        for n, ms in agg.most_common(6):
            print(f"{ms:8.3f} ms  {n[:70]}")


if __name__ == "__main__":
    main()
