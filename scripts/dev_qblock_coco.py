"""A/B the merged stage-1 qbottleneck at the 512^2 vs COCO-canvas block
shapes (matched total pixels) and sweep row_chunk at the COCO shape —
quantifies the whole-image-residency cost the COCO trace shows
(eval_pipeline.39-41: 9.6 ms for 3 stage-1 blocks vs ~5.4 expected).

Usage: python scripts/dev_qblock_coco.py
Then read the per-op table it prints (trace-timed, tunnel-safe).
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

LOGDIR = "/tmp/jax-trace-qblock-coco"
ITERS = 8


def main():
    from pytorch_object_detection_tpu.ops.pallas_qblock import qbottleneck

    rng = np.random.default_rng(0)
    # merged stage-1 interior block: Cin=Cout=256 (merged 512), Cw=64 (128)
    Cin, Cw = 512, 128
    w1 = jnp.asarray(rng.integers(-8, 8, (Cin, Cw)).astype(np.int8))
    w2 = jnp.asarray(rng.integers(-8, 8, (3, 3, Cw, Cw)).astype(np.int8))
    w3 = jnp.asarray(rng.integers(-8, 8, (Cw, Cin)).astype(np.int8))
    mk = lambda n, s: jnp.asarray(np.abs(rng.standard_normal(n)).astype(np.float32)) * s
    a1, b1 = mk(Cw, 1e-3), mk(Cw, .1)
    a2, b2 = mk(Cw, 1e-3), mk(Cw, .1)
    a3, b3 = mk(Cin, 1e-3), mk(Cin, .1)

    # NOTE: merged=False here because weights above are already the
    # block-diag size; io layout is what matters for the measurement.
    def make(name, bsz, h, w, rc):
        x = jnp.asarray(rng.integers(-127, 128, (bsz, h, w, Cin)).astype(np.int8))

        def f(x):
            return qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                               short_mul=0.9, row_chunk=rc).astype(jnp.int32).sum()
        f.__name__ = name
        jf = jax.jit(f)
        float(jf(x))  # compile+warm
        return jf, x

    cases = [
        ("b512", 128, 64, 128, 16),      # 512^2 shape: 128 imgs, 64x128 merged
        ("coco16", 32, 112, 352, 16),    # COCO shape, default rc
        ("coco8", 32, 112, 352, 8),
        ("coco28", 32, 112, 352, 28),
        # ("coco56", ...) removed: rc=56 im2col overflows the scoped VMEM limit
    ]
    runs = [(name, *make(name, b, h, w, rc)) for name, b, h, w, rc in cases]

    jax.profiler.start_trace(LOGDIR)
    chk = 0.0
    for name, jf, x in runs:
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
