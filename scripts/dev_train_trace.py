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

    # PODT_TRAIN_FROZEN=1: the reference training configuration (stage 1
    # frozen) with the r4 gradient barrier — frozen stages skip backward
    frozen = int(os.environ.get("PODT_TRAIN_FROZEN", "0"))
    model = HISFCOS(num_classes=20, frozen_stages=frozen)
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


def run_parts(batch: int, iters: int = 20):
    """Semantic attribution: time target-gen, forward(+loss), fwd+bwd, and
    the full step as separate jitted programs (each wall-clocked pipelined);
    the deltas attribute backward and optimizer cost."""
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.ops.losses import fcos_loss
    from pytorch_object_detection_tpu.ops.targets import generate_targets
    from pytorch_object_detection_tpu.ops.postprocess import flatten_level_preds
    from pytorch_object_detection_tpu.train.trainer import (
        _cast_tree,
        create_train_state,
        make_train_step,
    )

    # PODT_TRAIN_FROZEN=1: the reference training configuration (stage 1
    # frozen) with the r4 gradient barrier — frozen stages skip backward
    frozen = int(os.environ.get("PODT_TRAIN_FROZEN", "0"))
    model = HISFCOS(num_classes=20, frozen_stages=frozen)
    shapes = [(HW[0] // s, HW[1] // s) for s in STRIDES]
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *HW, 3),
                               {"lr": 1e-2, "momentum": 0.9})
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (batch, *HW, 3), jnp.float32)
    boxes = jnp.tile(jnp.array([[[60.0, 80.0, 300.0, 260.0], [-1.0] * 4]]),
                     (batch, 1, 1))
    labels = jnp.tile(jnp.array([[3, -1]], jnp.int32), (batch, 1))

    def loss_of(params, batch_stats, imgs, boxes, labels):
        apply_vars = {"params": _cast_tree(params, jnp.bfloat16),
                      "batch_stats": _cast_tree(batch_stats, jnp.bfloat16)}
        cls_l, cnt_l, reg_l = model.apply(apply_vars, imgs.astype(jnp.bfloat16), True)
        cls_p = flatten_level_preds([c.astype(jnp.float32) for c in cls_l])
        cnt_p = flatten_level_preds([c.astype(jnp.float32) for c in cnt_l])
        reg_p = flatten_level_preds([r.astype(jnp.float32) for r in reg_l])
        tgt = generate_targets(shapes, STRIDES, RANGES, boxes, labels)
        return fcos_loss(cls_p, cnt_p, reg_p, tgt.cls, tgt.cnt, tgt.reg)["total"]

    tgt_fn = jax.jit(lambda b, l: generate_targets(shapes, STRIDES, RANGES, b, l).cls.sum())
    fwd_fn = jax.jit(loss_of)
    def _value_plus_gradsum(p, bs, i, b, l):
        # consume EVERY grad leaf, else XLA dead-code-eliminates the backward
        v, g = jax.value_and_grad(loss_of)(p, bs, i, b, l)
        return v + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)) * 1e-12, g,
            jnp.float32(0))

    grad_fn = jax.jit(_value_plus_gradsum)
    step = make_train_step(model, shapes, STRIDES, RANGES, donate=False)

    def clock(label, fn, *args):
        out = fn(*args)
        leaf = out[1]["total"] if isinstance(out, tuple) else out
        float(jnp.asarray(leaf))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = out[1]["total"] if isinstance(out, tuple) else out
        float(jnp.asarray(leaf))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:18s} {ms:7.2f} ms", flush=True)
        return ms

    t_t = clock("target-gen", tgt_fn, boxes, labels)
    t_f = clock("fwd+loss", fwd_fn, state.params, state.batch_stats, imgs, boxes, labels)
    t_g = clock("fwd+bwd", grad_fn, state.params, state.batch_stats, imgs, boxes, labels)
    t_s = clock("full step", step, state, imgs, boxes, labels)
    print(f"-> backward ~{t_g - t_f:.2f} ms, optimizer+update ~{t_s - t_g:.2f} ms "
          f"(target-gen {t_t:.2f} is inside fwd+loss)", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "parts":
        run_parts(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
        return
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
