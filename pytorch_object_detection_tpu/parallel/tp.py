"""Tensor parallelism over the mesh's ``model`` axis.

The reference framework has no tensor parallelism (its only distribution is
DDP, `/root/reference/train.py:43-58`); the ``model`` axis of our mesh has
been a size-1 seam since round 1 (parallel/mesh.py).  This module makes the
seam real, the TPU way: instead of hand-written layer splits (Megatron
style), every parameter leaf gets a `PartitionSpec` that shards its channel
dimension over ``model``, and XLA's GSPMD propagation inserts the collectives
(all-gathers where a conv contracts over all input channels, psums on the
backward pass) — the "annotate shardings, let the compiler place the
collectives" recipe.

Rules (shape-based, so they cover params, gradients, optimizer momenta and
batch_stats uniformly):

* conv kernels ``[kh, kw, I, O]`` -> ``P(None, None, None, 'model')``
  (output channels sharded; depthwise kernels ``[kh, kw, 1, C]`` shard their
  channel dim the same way);
* per-channel vectors ``[C]`` (bias / BN / GN scale) -> ``P('model')``;
* anything whose dim does not divide the ``model`` axis size (class/reg
  predictor outputs, scalar `Scale`s, step counters) stays replicated.

Channel shards are contiguous, so GroupNorm groups (contiguous channel
blocks) land whole on one device: the normalize stays local.  SPMD is
semantics-preserving — `tests/test_tp.py` asserts a dp*tp step is
numerically equal to the single-device step.

Parameter/optimizer memory scales ~1/tp, which is what tensor parallelism
buys when a model no longer fits a chip's HBM; for the detection models
this repo ships, dp remains the throughput-optimal layout (params are tiny
next to activations) — see PERF.md.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_object_detection_tpu.parallel.mesh import MODEL_AXIS


def tp_spec(shape, tp: int, min_dim: int = 16) -> P:
    """PartitionSpec for one leaf: shard the channel dim over 'model'."""
    if tp <= 1:
        return P()
    if len(shape) == 4 and shape[-1] >= min_dim and shape[-1] % tp == 0:
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 1 and shape[0] >= min_dim and shape[0] % tp == 0:
        return P(MODEL_AXIS)
    return P()


def tp_state_shardings(mesh: Mesh, state):
    """NamedSharding tree for a TrainState (params/opt_state/batch_stats)."""
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, tp_spec(np.shape(x), tp)), state
    )


def shard_state_tp(mesh: Mesh, state):
    """Place a host/replicated TrainState onto the mesh, tensor-parallel.

    The returned state feeds the UNCHANGED train/eval steps: `jax.jit`
    reads the committed input shardings and GSPMD propagates them through
    the program (single-process meshes; multi-host TP would assemble
    global arrays per-process like mesh.shard_batch does).
    """
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, tp_state_shardings(mesh, state)
    )
