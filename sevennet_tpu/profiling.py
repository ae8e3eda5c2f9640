"""Profiling hooks (SURVEY §5: the reference has only env-var print
statements, ``pair_e3gnn_parallel.cpp:90-96``; here the JAX profiler is a
first-class surface).

- :func:`trace`: context manager writing a TensorBoard/XProf trace.
- :func:`step_timer`: lightweight wall-clock timer that forces completion
  through the device (needed on the axon tunnel where
  ``block_until_ready`` does not block; fetch a scalar instead).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["trace", "step_timer"]


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a JAX profiler trace into ``logdir`` (view with
    TensorBoard's profile plugin or xprof)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _Timer:
    def __init__(self):
        self.laps = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self, result=None):
        """End a lap; pass a device array to force completion first."""
        if result is not None:
            import jax

            leaf = jax.tree_util.tree_leaves(result)
            if leaf:
                float(leaf[0].ravel()[0])  # tunnel-safe completion fence
        dt = time.perf_counter() - self._t0
        self.laps.append(dt)
        self._t0 = time.perf_counter()
        return dt

    @property
    def mean(self):
        return sum(self.laps) / max(len(self.laps), 1)


@contextlib.contextmanager
def step_timer() -> Iterator[_Timer]:
    t = _Timer()
    t.start()
    yield t
