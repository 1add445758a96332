"""Profiling: jax.profiler traces + step timing.

TPU equivalent of the reference's torch.profiler hook
(run_glue.py:728-742, ProfCallback train_utils.py:558-566): traces land in
a TensorBoard-compatible directory; step timing and device-memory stats are
printed inline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, wait: int = 0):
    """Profile a block: ``with trace(dir): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {log_dir}")


def device_memory_stats() -> dict:
    """Per-device memory usage (peak/in-use bytes) when the backend exposes
    it (the TPU equivalent of torch.cuda.max_memory_allocated)."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats


class StepTimer:
    """Rolling step timing (throughput reporting for the train loop)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_s(self) -> Optional[float]:
        return sum(self._times) / len(self._times) if self._times else None
