"""Training-step performance: trace + batch/remat sweep (real TPU).

VERDICT r2 #4: attribute the ~41 ms (B=16) fused train step and measure
the obvious levers.  Runs the real make_train_step (fwd + target-gen +
loss + bwd + SGD, donate'd) on synthetic data at several (batch, remat)
points, reports sustained img/s per point from a pipelined wall clock
(steps are chained through donated state, so the wall clock is honest at
step granularity: each iteration must finish before the next can use its
state), and captures one profiler trace for the attribution table
(aggregate with scripts/dev_xplane_agg.py).

Usage: python scripts/dev_train_trace.py [sweep|trace] [B] [remat]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = (512, 512)
STRIDES = [8, 16, 32, 64, 128]
RANGES = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]


def build(batch: int, remat: bool):
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    model = HISFCOS(num_classes=20)
    shapes = [(HW[0] // s, HW[1] // s) for s in STRIDES]
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *HW, 3),
                               {"lr": 1e-2, "momentum": 0.9})
    step = make_train_step(model, shapes, STRIDES, RANGES, remat=remat)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (batch, *HW, 3), jnp.float32)
    boxes = jnp.tile(jnp.array([[[60.0, 80.0, 300.0, 260.0], [-1.0] * 4]]),
                     (batch, 1, 1))
    labels = jnp.tile(jnp.array([[3, -1]], jnp.int32), (batch, 1))
    return state, step, imgs, boxes, labels


def run_point(batch: int, remat: bool, iters: int = 20):
    state, step, imgs, boxes, labels = build(batch, remat)
    state, m = step(state, imgs, boxes, labels)  # compile + warm
    float(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, boxes, labels)
    float(m["total"])  # single fetch: steps chain through donated state
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    print(f"B={batch:3d} remat={int(remat)}: {dt * 1e3:7.2f} ms/step  "
          f"{ips:7.1f} img/s", flush=True)
    return ips


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "trace":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        remat = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
        state, step, imgs, boxes, labels = build(batch, remat)
        state, m = step(state, imgs, boxes, labels)
        float(m["total"])
        iters = 6
        with jax.profiler.trace(os.environ.get("TRACE_DIR", "/tmp/jax-trace-train")):
            for _ in range(iters):
                state, m = step(state, imgs, boxes, labels)
            float(m["total"])
        print(f"trace done ({iters} iters)", flush=True)
        return
    for batch in (16, 32, 64):
        run_point(batch, False)
    run_point(64, True)
    run_point(128, True)


if __name__ == "__main__":
    main()
