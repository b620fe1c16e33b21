"""COCO-canvas HISHead kernel ablation sweep (r5, VERDICT r4 #1).

Runs the fused int8 head P3 level (112x176, 80 classes, B=32) standalone
under each PODT_QHEAD_ABL setting and reports trace-attributed kernel
time, attributing the 14.2 ms whale's cost between:

  baseline    — the shipped kernel
  nostats     — GN sum/sumsq accumulation removed
  nosilu      — stem SiLU -> ReLU (transcendental cost)
  nodw        — depthwise taps removed (int8 VPU multiplies)
  skeleton    — ALL epilogue VPU work removed: the structural floor of
                this design (MXU dots + band plumbing + stores only)

Each setting is a separate subprocess (the knob is read at trace time).
Usage: python scripts/dev_qhead_coco_abl.py [B]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
B = sys.argv[1] if len(sys.argv) > 1 else "32"


def run_one(abl: str) -> float:
    env = {
        **os.environ,
        "B": B, "NC": "80", "SIZES": "112x176", "LEVELS": "0",
        "ITERS": os.environ.get("ITERS", "10"),
        "TRACE_DIR": f"/tmp/jax-trace-qhead-{abl or 'base'}",
    }
    if abl:
        env["PODT_QHEAD_ABL"] = abl
    else:
        env.pop("PODT_QHEAD_ABL", None)
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "dev_qhead_bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        print(f"{abl or 'baseline'}: FAILED\n{r.stderr[-1500:]}")
        return float("nan")
    agg = subprocess.run(
        [sys.executable, os.path.join(HERE, "dev_xplane_agg.py"),
         env["TRACE_DIR"], env["ITERS"], "10"],
        capture_output=True, text=True, timeout=300,
    )
    # kernel shows up as a custom-call row named after the pallas kernel
    t = None
    for line in agg.stdout.splitlines():
        if "qhead" in line or "custom-call" in line:
            m = re.search(r"([0-9.]+)\s*ms", line)
            if m:
                t = float(m.group(1))
                break
    wall = re.search(r"wall ([0-9.]+) ms", r.stdout)
    print(f"{abl or 'baseline':9s}: kernel {t if t is not None else '?'} ms, "
          f"wall {wall.group(1) if wall else '?'} ms/iter")
    print(agg.stdout[-1200:])
    return t if t is not None else float("nan")


def main() -> None:
    for abl in ("", "nostats", "nosilu", "nodw", "skeleton"):
        run_one(abl)


if __name__ == "__main__":
    main()
