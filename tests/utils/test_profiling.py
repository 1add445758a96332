"""Profiling helpers: trace context writes files; StepTimer averages."""

import os
import time

import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    trace,
)


def test_trace_writes(tmp_path):
    with trace(str(tmp_path)):
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
    # a plugins/ or .trace dir appears under the log dir
    entries = list(os.walk(str(tmp_path)))
    assert any(fn for _, _, files in entries for fn in files), "no trace files"


def test_step_timer():
    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        time.sleep(0.01)
        assert t.tick() > 0
    assert 0.005 < t.mean_step_s < 0.5


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU / tunnel
