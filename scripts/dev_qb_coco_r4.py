"""r4: qbottleneck band/row-chunk sweep at the COCO layer2/3/4 shapes.

The COCO e2e trace (B=32, 896x1408) shows per-pixel residency taxes vs
the 512^2 trace: layer2_1-3 2.22 ms vs 1.15*1.203=1.38 expected
(+0.84/block), layer4 2.56+1.90*2 vs 4.03 expected (+2.3 total); layer3
+0.5.  The shipped defaults are _pick_qb_bands (40 MB budget -> nb=2 at
layer2, nb=1 at layer3/4) and banded rc<=16.  This sweeps bands x rc per
shape, trace-timed like dev_qb_bands.py.

Usage: python scripts/dev_qb_coco_r4.py [shape] -- shape in
{layer2,layer3,layer4,all}
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

LOGDIR = "/tmp/jax-trace-qb-coco-r4"
ITERS = 8

SHAPES = {
    # name: (H, W, Cin, Cw), identity shortcut
    "layer2": (112, 176, 512, 128),
    "layer3": (56, 88, 1024, 256),
    "layer4": (28, 44, 2048, 512),
}


def build_runs(which):
    from pytorch_object_detection_tpu.ops.pallas_qblock import qbottleneck

    rng = np.random.default_rng(0)
    runs = []
    for name in ([which] if which != "all" else list(SHAPES)):
        H, W, Cin, Cw = SHAPES[name]
        w1 = jnp.asarray(rng.integers(-8, 8, (Cin, Cw)).astype(np.int8))
        w2 = jnp.asarray(rng.integers(-8, 8, (3, 3, Cw, Cw)).astype(np.int8))
        w3 = jnp.asarray(rng.integers(-8, 8, (Cw, Cin)).astype(np.int8))
        mk = lambda n, s: jnp.asarray(np.abs(rng.standard_normal(n)).astype(np.float32)) * s
        a1, b1 = mk(Cw, 1e-3), mk(Cw, .1)
        a2, b2 = mk(Cw, 1e-3), mk(Cw, .1)
        a3, b3 = mk(Cin, 1e-3), mk(Cin, .1)
        x = jnp.asarray(rng.integers(-127, 128, (32, H, W, Cin)).astype(np.int8))

        variants = {
            "layer2": [(None, None), (2, 8), (4, None), (4, 8), (8, None), (1, None)],
            "layer3": [(None, None), (2, None), (4, None), (2, 8), (1, 8)],
            "layer4": [(None, None), (2, None), (1, 7), (1, 4), (2, 7), (4, None)],
        }[name]
        for nb, rc in variants:
            tag = f"{name}_nb{nb}_rc{rc}"

            def f(x, nb=nb, rc=rc):
                return qbottleneck(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                                   short_mul=0.9, bands=nb, row_chunk=rc
                                   ).astype(jnp.int32).sum()
            f.__name__ = tag  # distinct executable names in the trace
            jf = jax.jit(f)
            float(jf(x))
            runs.append((tag, jf, x))
            print("compiled", tag, flush=True)
    return runs


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = build_runs(which)
    jax.profiler.start_trace(LOGDIR)
    chk = 0.0
    for tag, jf, x in runs:
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
                nm = md.name.split(".")[0]
                if nm.startswith("f") or "qblock" in nm or True:
                    per[md.name] += ev.duration_ps / 1e9
                    cnt[md.name] += 1
    print("-- per executable (ms/iter over", ITERS, "iters) --")
    for name, tot in per.most_common(40):
        if cnt[name] >= ITERS:
            print(f"  {tot / ITERS:7.3f} ms  x{cnt[name]:3d}  {name}")


if __name__ == "__main__":
    main()
