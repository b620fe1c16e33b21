"""Learning-rate schedules matching the reference trainers.

  * :func:`warmup_step_decay` — linear warmup from ``warmup_factor*lr`` to
    ``lr`` over ``warmup_steps``, then x``gamma`` at each milestone.
    With (500, 1/3, [120000, 160000], 0.1) this is train_new.py's ``lr_func``
    (train_new.py:74-90); with (501, ~0, [20001, 50001], 0.1) it is
    train.py's manual warmup/decay (train.py:160-173).
  * :func:`poly_lr` — PolyLR (reference utill/utills.py:87-97).

All are pure ``step -> lr`` functions usable directly by optax.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_step_decay(
    lr_init: float,
    warmup_steps: int = 500,
    warmup_factor: float = 1.0 / 3.0,
    milestones: Sequence[int] = (120000, 160000),
    gamma: float = 0.1,
):
    milestones = jnp.asarray(list(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        warm = warmup_factor * (1.0 - alpha) + alpha
        n_decays = jnp.sum(step >= milestones.astype(jnp.float32))
        decay = gamma ** n_decays.astype(jnp.float32)
        return jnp.where(step < warmup_steps, lr_init * warm, lr_init * decay)

    return schedule


def poly_lr(lr_init: float, max_iter: int, power: float = 0.9, min_lr: float = 1e-6):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = lr_init * jnp.power(jnp.maximum(1.0 - step / max_iter, 0.0), power)
        return jnp.maximum(lr, min_lr)

    return schedule
