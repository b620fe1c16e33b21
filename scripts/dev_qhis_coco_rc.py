"""r4: qhisblock row_chunk sweep at the COCO P3 shape (112x176x256, B=32).

The COCO e2e trace shows the biggest HisBlock instance at 6.95 ms vs a
5.4 ms per-pixel-parity expectation from the 512^2 trace (+29%); the
layer-4 qbottleneck sweep found a 2.6x rc cliff at a COCO shape, so
check whether the his kernel's default rc=16 is similarly off at 112
rows.  Synthetic blk (right shapes/dtypes; numerics irrelevant for
timing).  Trace-timed custom-call durations; beware the dedupe trap —
every variant must produce distinct HLO (distinct rc => distinct kernel).

Usage: python scripts/dev_qhis_coco_rc.py
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

LOGDIR = "/tmp/jax-trace-qhis-rc"
ITERS = 8
H, W, C = 112, 176, 256  # COCO P3; C = feature width, half-split inside


def make_blk(rng, cin):
    half = cin // 2
    r = max(1, half // 4)
    i8 = lambda *s: jnp.asarray(rng.integers(-8, 8, s).astype(np.int8))
    f32 = lambda *s: jnp.asarray(np.abs(rng.standard_normal(s)).astype(np.float32)) * 1e-3
    return {
        "w1": i8(cin, half), "w2": i8(cin, half),
        "wdw": i8(3, 3, half), "w3": i8(3, 3, cin, half),
        "w4": i8(3, 3, cin, cin),
        "A1": f32(half), "B1": f32(half), "A2": f32(half), "B2": f32(half),
        "Adw": f32(half), "Bdw": f32(half), "A3": f32(half), "B3": f32(half),
        "A4": f32(cin), "B4": f32(cin),
        "inv_x1": jnp.float32(120.0), "inv_out": jnp.float32(120.0),
        "se_premul": jnp.float32(0.01),
        "se_w1": f32(half, r), "se_b1": f32(r),
        "se_w2": f32(r, half), "se_b2": f32(half),
    }


def main():
    from pytorch_object_detection_tpu.ops.pallas_qhis import qhisblock

    rng = np.random.default_rng(0)
    blk = make_blk(rng, C)
    x = jnp.asarray(rng.integers(-127, 128, (32, H, W, C)).astype(np.int8))

    runs = []
    for rc in (16, 14, 8, 7, 4):
        tag = f"his_rc{rc}"

        def f(x, rc=rc):
            return qhisblock(blk, x, row_chunk=rc).astype(jnp.int32).sum()
        f.__name__ = tag
        jf = jax.jit(f)
        float(jf(x))
        runs.append((tag, jf))
        print("compiled", tag, flush=True)

    jax.profiler.start_trace(LOGDIR)
    chk = 0.0
    for tag, jf in runs:
        for _ in range(ITERS):
            chk = jf(x)
    float(chk)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    per = collections.Counter()
    cnt = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                per[md.name.split(" = ")[0]] += ev.duration_ps / 1e9
                cnt[md.name.split(" = ")[0]] += 1
    print("-- per executable (ms per call) --")
    for name, tot in per.most_common(30):
        if "his_rc" in name and cnt[name]:
            print(f"  {tot / cnt[name]:7.3f} ms  x{cnt[name]:3d}  {name[:80]}")


if __name__ == "__main__":
    main()
