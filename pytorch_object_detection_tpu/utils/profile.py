"""Profiling / tracing hooks (jax.profiler) + device memory stats.

Replaces the reference's manual ``torch.cuda.synchronize`` wall-clock timing
(test.py:200-223) and per-step ``memory_reserved`` prints (train.py:197)
with the proper TPU facilities: a trace context writing TensorBoard-viewable
profiles, named step/op annotations, and HBM stats from the device API.
"""
from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace (open in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (use around steps)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """HBM usage for one device (None if backend doesn't expose it)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", -1)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
        "bytes_limit": int(stats.get("bytes_limit", -1)),
    }


class StepTimer:
    """Throughput meter over pipelined steps (images/sec, EMA-smoothed)."""

    def __init__(self, smoothing: float = 0.9):
        import time

        self._time = time.perf_counter
        self._last = self._time()
        self._ema = None
        self._smoothing = smoothing

    def tick(self, images: int) -> float:
        now = self._time()
        rate = images / max(now - self._last, 1e-9)
        self._last = now
        self._ema = rate if self._ema is None else (
            self._smoothing * self._ema + (1 - self._smoothing) * rate
        )
        return self._ema
