"""Worker process for the two-process `jax.distributed` test.

Launched by tests/test_multiprocess.py as ``python tests/mp_worker.py
<pid> <nproc> <port> <out.json>``.  Each worker owns 4 simulated CPU
devices; together they form the 8-device global mesh.  This exercises the
REAL multi-process topology the reference reaches with torch.distributed
DDP (`/root/reference/train.py:43-58`): `jax.distributed.initialize`, the
per-process loader sharding driven by the live `jax.process_index()`, a
global-mesh shard_map train step with explicit pmean collectives, and
cross-process replicated outputs.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    try:  # cross-process CPU collectives ride gloo where configurable
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    from pytorch_object_detection_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_object_detection_tpu.data.pipeline import DetectionLoader
    from pytorch_object_detection_tpu.models.fcos import HISFCOS
    from pytorch_object_detection_tpu.parallel.mesh import batch_sharding, create_mesh
    from pytorch_object_detection_tpu.train.trainer import (
        create_train_state,
        make_shard_map_train_step,
    )

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, n_global
    assert len(jax.local_devices()) == 4

    # --- per-process loader sharding from the LIVE process topology
    class _Stub:
        def __len__(self):
            return 11

    loader = DetectionLoader(_Stub(), batch_size=2, shuffle=False)
    indices = [int(i) for i in loader._indices()]

    # --- one shard_map train step over the global mesh
    hw = (128, 128)
    strides = [8, 16, 32, 64, 128]
    shapes = [(hw[0] // s, hw[1] // s) for s in strides]
    ranges = [(-1, 32), (32, 96), (96, 192), (192, 384), (384, 9999999)]
    model = HISFCOS(num_classes=20, features=64)
    mesh = create_mesh()  # all 8 global devices on the data axis

    state = create_train_state(model, jax.random.PRNGKey(1), (1, *hw, 3), {"lr": 1e-2})

    # identical sample replicated to every shard (uniform num_pos -> the
    # DDP local normalization equals the global one; see test_trainer.py)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (1, *hw, 3)))
    boxes = np.array([[[10.0, 10.0, 80.0, 90.0], [-1.0] * 4]], np.float32)
    labels = np.array([[3, -1]], np.int32)
    local = lambda x: np.tile(x, (4,) + (1,) * (x.ndim - 1))
    sh = batch_sharding(mesh)
    mk = lambda x: jax.make_array_from_process_local_data(
        sh, local(x), (n_global,) + x.shape[1:])
    imgs_g, boxes_g, labels_g = mk(img), mk(boxes), mk(labels)

    repl = NamedSharding(mesh, P())
    state_g = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x), np.shape(x)),
        state,
    )

    step = make_shard_map_train_step(
        model, shapes, strides, ranges, mesh, compute_dtype=jnp.float32)
    with mesh:
        new_state, metrics = step(state_g, imgs_g, boxes_g, labels_g)

    head_leaf = jax.tree_util.tree_leaves(new_state.params["head"])[0]
    result = {
        "pid": pid,
        "process_count": int(jax.process_count()),
        "n_devices": n_global,
        "indices": indices,
        "total": float(metrics["total"]),
        "cls": float(metrics["cls"]),
        "head_norm": float(jnp.linalg.norm(head_leaf.astype(jnp.float32))),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", pid, "ok", flush=True)


if __name__ == "__main__":
    main()
