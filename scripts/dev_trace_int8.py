"""Capture a profiler trace of the SHIPPED int8 bench pipeline (bench.py
PODT_BENCH_MODE=int8) so the remaining ms are attributed accurately.

Usage: python scripts/dev_trace_int8.py [batch]
Then:  python scripts/dev_xplane_agg.py /tmp/jax-trace-int8 6 40
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

LOGDIR = "/tmp/jax-trace-int8"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    hw = (512, 512)
    if os.environ.get("PODT_BENCH_HW"):  # e.g. "896x1408" (COCO canvas)
        hw = tuple(int(v) for v in os.environ["PODT_BENCH_HW"].split("x"))
    run, _ = bench.build_pipeline("int8", hw, batch)
    float(run())  # compile + warm

    jax.profiler.start_trace(LOGDIR)
    chks = [run() for _ in range(6)]
    float(chks[-1])
    jax.profiler.stop_trace()
    print("trace written to", LOGDIR)


if __name__ == "__main__":
    main()
