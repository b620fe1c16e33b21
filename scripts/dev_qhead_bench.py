"""Micro-bench (real TPU): the fused int8 HISHead level kernel at the P3
serving shape.  Times ops/pallas_qhead.qhishead_level standalone at the
bench config (features=256, 512^2 canvas -> P3 64x64) so head-kernel
changes can be attributed without the e2e noise floor.

Usage: B=64 python scripts/dev_qhead_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "64"))
C = int(os.environ.get("C", "256"))
NC = int(os.environ.get("NC", "20"))


def main():
    from pytorch_object_detection_tpu.models.heads import HISHead
    from pytorch_object_detection_tpu.models.head_int8 import (
        calibrate_hishead,
        quantize_hishead,
    )
    from pytorch_object_detection_tpu.ops.pallas_qhead import (
        qhishead_level,
        qhishead_level2,
    )

    if os.environ.get("PODT_QHEAD_V2", "0") == "1":  # r5 pipelined kernel
        qhishead_level = qhishead_level2

    if os.environ.get("SIZES"):  # e.g. SIZES=112x176,56x88 (COCO canvas)
        sizes = [tuple(int(v) for v in s.split("x"))
                 for s in os.environ["SIZES"].split(",")]
    else:
        sizes = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4)]
    only = os.environ.get("LEVELS")  # e.g. "0" = P3 only
    keep = [int(v) for v in only.split(",")] if only else list(range(len(sizes)))
    head = HISHead(num_classes=NC, features=C)
    levels1 = [jax.random.normal(jax.random.PRNGKey(i), (1, *s, C))
               for i, s in enumerate(sizes)]
    v = jax.jit(head.init)(jax.random.PRNGKey(0), levels1)
    s_lv = [float(jnp.max(jnp.abs(l))) / 127.0 for l in levels1]
    taps = {k: float(x)
            for k, x in jax.jit(calibrate_hishead)(v["params"], levels1).items()}
    q = quantize_hishead(v["params"], taps, s_lv, NC)

    # tunnel roundtrip ~24 ms floors any wall-clock of a <25 ms kernel
    # (PERF.md), so device time comes from a profiler trace: run all five
    # levels x ITERS inside one trace, aggregate per level via
    # scripts/dev_xplane_agg.py (kernels appear as custom-call ops).
    iters = int(os.environ.get("ITERS", "10"))
    xs_q = [jax.random.randint(jax.random.PRNGKey(i + 7), (B, *s, C),
                               -127, 128, jnp.int8)
            for i, s in enumerate(sizes)]
    rc = int(os.environ.get("RC", "16"))
    fns = []
    for i in keep:
        fn = jax.jit(lambda lvv, xq: qhishead_level(q, lvv, xq, num_classes=NC,
                                                    row_chunk=rc))
        cls, cr = fn(q["levels"][i], xs_q[i])
        float(jnp.asarray(cls.astype(jnp.float32)).sum())  # warm/compile
        fns.append(fn)

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/jax-trace-qhead")
    with jax.profiler.trace(trace_dir):
        chk = None
        t0 = time.perf_counter()
        for _ in range(iters):
            for i, fn in zip(keep, fns):
                cls, cr = fn(q["levels"][i], xs_q[i])
            new = cls.astype(jnp.float32).sum()
            if chk is not None:
                float(chk)
            chk = new
        float(chk)
    wall = (time.perf_counter() - t0) / iters * 1e3
    print(f"all-levels wall {wall:.2f} ms/iter (B={B}, C={C}, nc={NC}); "
          f"trace in {trace_dir} — aggregate with dev_xplane_agg.py", flush=True)


if __name__ == "__main__":
    main()
