"""Metric writer: TensorBoard events + stdout (reference train.py:136-196).

Rank-0-only by construction (callers gate on `jax.process_index()`); losses
arrive already pmean-reduced inside the jitted step, so there is no
all_gather + host loop like the reference's `all_gather_multigpu` logging.
"""
from __future__ import annotations

from typing import Dict, Optional


class MetricWriter:
    def __init__(self, logdir: Optional[str] = None):
        self._tb = None
        if logdir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                try:
                    from tensorboardX import SummaryWriter  # type: ignore

                    self._tb = SummaryWriter(logdir)
                except Exception:
                    self._tb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
