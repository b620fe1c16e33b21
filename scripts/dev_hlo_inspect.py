"""AOT-compile the bench int8 pipeline once and dump the optimized HLO to
/tmp/eval_pipeline_hlo.txt so trace op names (copy.N, reduce-window.N)
map to program locations.  Usage: python scripts/dev_hlo_inspect.py [batch]"""
from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import bench

    run, _ = bench.build_pipeline("int8", (512, 512), batch)
    cells = inspect.getclosurevars(run).nonlocals
    jitted = cells["eval_pipeline"]
    args = [cells[k] for k in ("qtree", "params", "batch_stats", "images")]
    txt = jitted.lower(*args).compile().as_text()
    out = "/tmp/eval_pipeline_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
