"""Device mesh + sharding layout.

TPU-native replacement for the reference's NCCL/DDP distributed layer
(`/root/reference/train.py:43-58`, `train_new.py:35-51`): instead of one
process per accelerator with bucketed all-reduce, we build a
`jax.sharding.Mesh` over all devices, shard the batch over a ``data`` axis,
and replicate parameters.  XLA inserts the gradient all-reduce (psum over
ICI) when the jitted train step consumes sharded inputs and produces
replicated gradients — the SPMD equivalent of DDP's backward hook.

The mesh keeps a ``model`` axis seam so tensor-parallel sharding can be
added without touching the trainer (SURVEY §2.8: the reference obligates
only DP; the seam is deliberate).

Multi-host: `initialize_distributed` wraps `jax.distributed.initialize`
(env-driven), after which `jax.devices()` spans all hosts and the same mesh
code works; per-host input sharding is handled by the data pipeline using
`jax.process_index()` (replacing DistributedSampler).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (replaces torch.distributed env:// NCCL init).

    On single-host with no coordinator (the common case, incl. this
    environment) it is a no-op.  With an explicit coordinator (or under a
    multi-host launcher that sets the env vars jax reads), it brings up the
    cross-process runtime: afterwards `jax.devices()` spans all hosts, the
    same mesh code works, and collectives cross process boundaries.
    Exercised for real (2 CPU processes) by tests/test_multiprocess.py.
    """
    if coordinator is not None:
        # must be decided BEFORE backends initialize (jax.default_backend()
        # here would lock in the platform) — read the config value instead
        if (jax.config.jax_platforms or "").startswith("cpu"):
            try:  # cross-process CPU collectives ride gloo where configurable
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif jax.process_count() > 1:
        jax.distributed.initialize()


def create_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: int = -1,
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over (data, model) axes; data defaults to all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel == -1:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a per-process batch onto the mesh, sharded over the data axis.

    Single-process: a plain device_put.  Multi-process: torch-DDP batch
    semantics (`/root/reference/train.py:43-58` — batch_size is per-rank):
    each process contributes its local batch as its row-slice of a global
    array of leading dim ``local_B * process_count``, via
    `jax.make_array_from_process_local_data` (device_put cannot target
    non-addressable devices).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state):
    repl = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
    # every process holds the same host-local value (same PRNG seed / same
    # restored checkpoint); assemble it into one fully-replicated global array
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x), np.shape(x)),
        state,
    )
