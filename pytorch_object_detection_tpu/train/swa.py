"""Stochastic Weight Averaging.

The reference imports AveragedModel/SWALR and carries an ``swa_enabled``
flag but the update loop is commented out (train.py:13,38,201-206); here it
is a working functional implementation: a running (uniform or EMA) average
of params plus the constant-SWA learning-rate schedule.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SWAState(NamedTuple):
    params: any
    count: jnp.ndarray  # number of averaged snapshots


def swa_init(params) -> SWAState:
    # copy=True: the live params' buffers are DONATED into the next train
    # step (make_train_step donate_argnums); the average must own its memory
    return SWAState(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        jnp.zeros((), jnp.int32),
    )


def swa_update(state: SWAState, params, decay: Optional[float] = None) -> SWAState:
    """Uniform running average (decay=None, torch AveragedModel default) or
    EMA (decay in (0,1))."""
    n = state.count
    if decay is None:
        w = 1.0 / (n.astype(jnp.float32) + 1.0)
    else:
        w = 1.0 - decay
    new = jax.tree_util.tree_map(lambda a, p: a + w * (p - a), state.params, params)
    return SWAState(new, n + 1)


def swa_lr(base_lr: float, swa_lr_value: float, swa_start_step: int):
    """SWALR-style schedule: base LR until swa_start, constant after."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < swa_start_step, base_lr, swa_lr_value)

    return schedule
