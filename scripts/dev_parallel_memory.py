"""Measure what tp/sp actually buy (VERDICT r4 #7): per-device memory on
the 8-device virtual mesh vs single-device, via committed shardings +
``jax.stages.Compiled.memory_analysis``.

- tp: per-device bytes of the TrainState (params + opt momenta +
  batch_stats) under parallel/tp.py's shape-based shardings — the
  docstring's "parameter/optimizer memory ~1/tp" claim.
- sp: per-device XLA temp (activation workspace) of the compiled train
  step with image rows sharded over 'model' — the "activation memory
  ~1/sp for the trunk" claim.

Prints a table; the measured numbers live in PERF.md ("what tp/sp buy")
and the scaling assertions in tests/test_tp.py / tests/test_sp.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pytorch_object_detection_tpu.models.fcos import HISFCOS  # noqa: E402
from pytorch_object_detection_tpu.parallel.mesh import (  # noqa: E402
    create_mesh,
    replicated,
)
from pytorch_object_detection_tpu.parallel.sp import shard_batch_spatial  # noqa: E402
from pytorch_object_detection_tpu.parallel.tp import shard_state_tp  # noqa: E402
from pytorch_object_detection_tpu.train.trainer import (  # noqa: E402
    create_train_state,
    make_train_step,
)

HW = tuple(int(x) for x in os.environ.get("PODT_MEM_HW", "256,256").split(","))
BATCH = int(os.environ.get("PODT_MEM_BATCH", "8"))
FEATURES = int(os.environ.get("PODT_MEM_FEATURES", "256"))
STRIDES = [8, 16, 32, 64, 128]
SHAPES = [(HW[0] // s, HW[1] // s) for s in STRIDES]
RANGES = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]


def device0_bytes(tree) -> int:
    """Bytes device 0 actually holds (shard size; full size if replicated)."""
    return sum(
        leaf.addressable_shards[0].data.nbytes
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "addressable_shards")
    )


def full_bytes(tree) -> int:
    return sum(
        getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(tree)
    )


def main() -> None:
    model = HISFCOS(num_classes=20, features=FEATURES)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, *HW, 3), {"lr": 1e-2})
    total = full_bytes(state)
    print(f"HISFCOS(features={FEATURES}) @ {HW}, batch {BATCH}")
    print(f"TrainState (params+opt+stats) full size: {total/2**20:.1f} MiB")

    print("\n== tp: per-device TrainState bytes (parallel/tp.py shardings) ==")
    for tp in (2, 4, 8):
        mesh = create_mesh(model_parallel=tp)
        tp_state = shard_state_tp(mesh, state)
        dev0 = device0_bytes(tp_state)
        print(
            f"tp={tp}: {dev0/2**20:8.1f} MiB/device  = {dev0/total:.3f}x full "
            f"(ideal 1/{tp} = {1/tp:.3f})"
        )

    print("\n== sp: per-device compiled-step temp bytes ==")
    step = make_train_step(
        model, SHAPES, STRIDES, RANGES, compute_dtype=jnp.float32, donate=False
    )
    img = jnp.asarray(
        np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (BATCH, *HW, 3)))
    )
    boxes = jnp.tile(
        jnp.asarray([[[10.0, 10.0, 80.0, 90.0], [-1.0] * 4]], jnp.float32),
        (BATCH, 1, 1),
    )
    labels = jnp.tile(jnp.asarray([[3, -1]], jnp.int32), (BATCH, 1))

    base = (
        step.lower(state, img, boxes, labels).compile().memory_analysis()
    )
    print(
        f"single-device: temp {base.temp_size_in_bytes/2**20:8.1f} MiB, "
        f"args {base.argument_size_in_bytes/2**20:.1f} MiB"
    )
    for dp, sp in ((2, 4), (1, 8)):
        mesh = create_mesh(data_parallel=dp, model_parallel=sp)
        sp_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), state
        )
        s_img, s_boxes, s_labels = shard_batch_spatial(mesh, img, boxes, labels)
        ma = (
            step.lower(sp_state, s_img, s_boxes, s_labels)
            .compile()
            .memory_analysis()
        )
        t = ma.temp_size_in_bytes
        print(
            f"dp={dp} x sp={sp}: temp {t/2**20:8.1f} MiB/device  = "
            f"{t/base.temp_size_in_bytes:.3f}x single "
            f"(ideal 1/{dp*sp} = {1/(dp*sp):.3f})"
        )


if __name__ == "__main__":
    main()
