"""Aggregate xplane device events into a per-iteration category breakdown.

Usage: python scripts/dev_xplane_agg.py [trace_dir] [iters] [top_n]
"""
from __future__ import annotations

import collections
import glob
import re
import sys


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-bench"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 35
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        per_op = collections.Counter()
        cat = collections.Counter()
        for line in plane.lines:
            print(f"   [line] {line.name}: {len(line.events)} events")
            # only the synchronous op line carries attributable device time;
            # "Async XLA Ops" (DMA slices) overlap compute and "Steps" is the
            # per-step umbrella — summing either double-counts the iteration
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                op = name.split(" = ")[0].lstrip("%")
                if name.startswith("jit_") or op.startswith(("copy-start", "copy-done")):
                    continue
                ms = ev.duration_ps / 1e9 / iters
                per_op[op] += ms
                base = re.sub(r"[.%]|\d+$", "", op)
                cat[base] += ms
        total = sum(per_op.values())
        print(f"== {plane.name}: {total:.2f} ms/iter (excl. copies/umbrella) ==")
        print("-- categories --")
        for name, ms in cat.most_common(25):
            print(f"{ms:8.3f} ms  {name}")
        print("-- top ops --")
        for name, ms in per_op.most_common(top_n):
            print(f"{ms:8.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
