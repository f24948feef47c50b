"""Profiling / tracing utilities (SURVEY.md §5 'tracing').

The reference has only wall-clock timers (code/utils/timer.py); the
TPU-native equivalents add:

  * :func:`trace` — context manager around ``jax.profiler`` emitting an
    xplane trace viewable in TensorBoard / Perfetto.
  * :func:`timed` — correct device timing on backends where
    ``block_until_ready`` is unreliable (forces a host readback; see
    PERF_NOTES.md) with sync-latency amortization.
  * :class:`StepTimer` — rolling it/s + device-time bookkeeping for train
    loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/glare_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def host_sync(out):
    """Reliable execution barrier: read one element back to the host."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf).ravel()[0]


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2):
    """Return (seconds_per_call, last_output). Amortizes the sync RPC."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    host_sync(out)
    return (time.perf_counter() - t0) / iters, out


class StepTimer:
    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self._t0 = None

    def tick(self):
        self._t0 = time.perf_counter()

    def tock(self):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def steps_per_sec(self):
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)


def memory_stats():
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
