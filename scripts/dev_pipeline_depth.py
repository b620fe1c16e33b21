"""Probe the wall-vs-device gap: sweep the submit/fetch pipeline depth.

The bench keeps ONE checksum in flight (fetch iter i-1 while i runs).
Device trace says ~54.6 ms/iter at B=128 but wall is ~59.6 — if the gap
is dispatch/tunnel latency, deeper pipelining should close it; if it is
device-side, depth changes nothing.  One compile, all depths timed in
the same process.

Usage: python scripts/dev_pipeline_depth.py [batch] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(run, iters, depth):
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        pending.append(run())
        if len(pending) > depth:
            float(pending.pop(0))
    for c in pending:
        float(c)
    return time.perf_counter() - t0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    import bench

    run, _ = bench.build_pipeline("int8", (512, 512), batch)
    float(run())  # compile + warm

    for depth in (1, 2, 3, 4, 8, 2, 1):  # repeats guard against drift
        dt = timeit(run, iters, depth)
        print(f"depth {depth}: {dt / iters * 1e3:7.2f} ms/iter  "
              f"{batch * iters / dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
