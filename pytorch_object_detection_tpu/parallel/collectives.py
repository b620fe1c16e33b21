"""Explicit collective seams for `shard_map`-style parallelism.

The jit + NamedSharding path (parallel/mesh.py) lets XLA insert collectives
automatically; these helpers are the explicit equivalents for code running
under `jax.shard_map` — the TPU-native analogues of the reference's NCCL
calls (`train.py:184-190` all_gather of losses, DDP grad all-reduce,
SyncBatchNorm stat sync at `train.py:103`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_object_detection_tpu.parallel.mesh import DATA_AXIS


def psum_grads(grads, axis: str = DATA_AXIS):
    """Sum gradients across data-parallel replicas (DDP all-reduce)."""
    return jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)


def pmean_grads(grads, axis: str = DATA_AXIS):
    """Mean gradients across replicas (DDP semantics: mean over global batch)."""
    return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)


def pmean_metrics(metrics, axis: str = DATA_AXIS):
    """Average scalar metrics across replicas (replaces all_gather_multigpu
    + host mean of per-rank losses)."""
    return jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, axis), metrics)


def sync_batch_stats(mean: jnp.ndarray, var: jnp.ndarray, axis: str = DATA_AXIS):
    """Cross-replica BatchNorm statistics (SyncBatchNorm equivalent).

    Only needed when BN is unfrozen; the reference trains with all BN frozen.
    """
    return jax.lax.pmean(mean, axis), jax.lax.pmean(var, axis)
