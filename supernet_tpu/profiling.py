"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only instrumentation is wall-clock ``timeit`` around training
and around one inference batch (`Hippocampus.py:563,726,952-954`). Here:

- ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution (XLA ops, fusion, HBM);
- ``StepTimer`` — rolling per-step wall-clock with device sync on demand,
  used by the Trainer for steps/sec and by bench.py;
- ``device_memory_stats()`` — live HBM usage per device where the backend
  exposes it (TPU does).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``with profiling.trace("/tmp/trace"):`` — wraps jax.profiler's
    start/stop; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter.

    ``tick()`` marks a step boundary; ``rate(window)`` is steps/sec over the
    last ``window`` steps. Call ``sync(x)`` with a live array before reading
    rates in async-dispatch code (blocks until the device caught up).
    """

    def __init__(self) -> None:
        self.times: List[float] = []

    def tick(self) -> None:
        self.times.append(time.perf_counter())

    @staticmethod
    def sync(x) -> None:
        """Force device completion of everything ``x`` depends on.

        Fetches one scalar to the host rather than ``block_until_ready``:
        on relayed/remote TPU transports (axon) block_until_ready acks
        dispatch, not completion, which silently inflates rates by orders
        of magnitude. A value fetch cannot return before the compute does.
        """
        import jax

        leaf = jax.tree_util.tree_leaves(x)[0]
        if hasattr(leaf, "ndim"):
            float(leaf.reshape(-1)[0])
        else:  # pragma: no cover
            jax.block_until_ready(x)

    def rate(self, window: int = 50) -> float:
        t = self.times[-window:]
        if len(t) < 2:
            return 0.0
        return (len(t) - 1) / (t[-1] - t[0])

    def total_seconds(self) -> float:
        if len(self.times) < 2:
            return 0.0
        return self.times[-1] - self.times[0]


def device_memory_stats() -> Dict[str, Optional[int]]:
    """{device: bytes_in_use} where the backend reports it (TPU/GPU)."""
    import jax

    out: Dict[str, Optional[int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = stats.get("bytes_in_use") if stats else None
        except Exception:
            out[str(d)] = None
    return out


def enable_nan_debugging() -> None:
    """The analog of the reference's inline NaN scrubbing
    (`Hippocampus.py:314-315`) for debugging: makes any NaN produced under
    jit raise with the offending jaxpr (jax_debug_nans)."""
    import jax

    jax.config.update("jax_debug_nans", True)
