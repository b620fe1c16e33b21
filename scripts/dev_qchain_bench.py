"""Hardware A/B for the chained-segment backbone (ops/pallas_qchain).

Builds the full int8 serving pipeline twice (PODT_QCHAIN=0/1), checks the
detections are bit-identical on the real chip, and times both.

Usage: python scripts/dev_qchain_bench.py [batch] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(batch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench.build_pipeline("int8", (512, 512), batch)


def timeit(run, iters):
    float(run())
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        chk = run()
        if prev is not None:
            float(prev)
        prev = chk
    float(prev)
    return time.perf_counter() - t0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    os.environ["PODT_QCHAIN"] = "0"
    run0, _ = build(batch)
    chk0 = float(run0())

    os.environ["PODT_QCHAIN"] = "1"
    run1, _ = build(batch)
    chk1 = float(run1())

    print(f"checksum base={chk0!r} chain={chk1!r} equal={chk0 == chk1}")
    assert chk0 == chk1, "qchain changed the detections!"

    dt0 = timeit(run0, iters)
    dt1 = timeit(run1, iters)
    r0, r1 = batch * iters / dt0, batch * iters / dt1
    print(f"base : {dt0 / iters * 1e3:7.2f} ms/iter  {r0:7.1f} img/s")
    print(f"chain: {dt1 / iters * 1e3:7.2f} ms/iter  {r1:7.1f} img/s  "
          f"({(r1 / r0 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
