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
    """Place a host batch onto the mesh, sharded over the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), state)
