"""Parse a JAX xplane.pb trace and print per-HLO-op self-time, aggregated.

Usage: python scripts/dev_xplane_stats.py [trace_dir] [top_n]
"""
from __future__ import annotations

import collections
import glob
import sys


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-bench"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xs = load(sorted(paths)[-1])

    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name} ==")
        # line = a thread/stream; events reference metadata ids
        md = plane.event_metadata
        agg = collections.Counter()
        cnt = collections.Counter()
        total = 0
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e9  # ms
                agg[name] += dur
                cnt[name] += 1
                total += dur
        print(f"total device event time: {total:.2f} ms over all lines")
        for name, ms in agg.most_common(top_n):
            print(f"{ms:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")
        print()


if __name__ == "__main__":
    main()
