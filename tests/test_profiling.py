"""Profiling subsystem smoke tests (SURVEY §5 tracing): the jax.profiler
trace context produces an artifact, StepTimer math is sane, memory stats
don't crash on any backend."""

import os

import jax
import jax.numpy as jnp

from supernet_tpu import profiling


def test_trace_writes_artifacts(tmp_path):
    with profiling.trace(str(tmp_path)):
        x = jnp.ones((8, 8))
        profiling.StepTimer.sync(x * 2)
    # the profiler lays down plugins/profile/<run>/...
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "trace produced no files"


def test_step_timer_rate():
    import time

    t = profiling.StepTimer()
    t.tick()
    time.sleep(0.01)
    t.tick()
    time.sleep(0.01)
    t.tick()
    r = t.rate(window=3)
    assert 10 < r < 1000  # ~100 ticks/sec
    assert t.total_seconds() > 0.015


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) == jax.device_count()
    for v in stats.values():
        assert v is None or isinstance(v, int)
