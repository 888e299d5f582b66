"""Profiling / observability helpers (new capability vs the reference,
which has none -- SURVEY.md §5).

  - `StepTimer`: wall-clock throughput accounting for MD loops
    (steps/sec, ns/day given a timestep).
  - `trace(logdir)`: context manager around the jax profiler; view with
    TensorBoard or xprof.
  - `block_timed(fn, *args)`: time one call including device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, timestep_fs: float | None = None):
        self.timestep_fs = timestep_fs
        self.reset()

    def reset(self):
        self.steps = 0
        self.elapsed = 0.0
        self._t0 = None

    @contextlib.contextmanager
    def measure(self, nsteps: int):
        t0 = time.perf_counter()
        yield
        self.elapsed += time.perf_counter() - t0
        self.steps += nsteps

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def ns_per_day(self) -> float | None:
        if self.timestep_fs is None or not self.elapsed:
            return None
        return self.steps_per_sec * self.timestep_fs * 1e-6 * 86400.0

    def summary(self) -> dict:
        out = {"steps": self.steps, "elapsed_s": round(self.elapsed, 4),
               "steps_per_sec": round(self.steps_per_sec, 3)}
        if self.ns_per_day is not None:
            out["ns_per_day"] = round(self.ns_per_day, 3)
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax profiler trace of the enclosed block."""
    with jax.profiler.trace(logdir):
        yield


def block_timed(fn, *args, **kwargs):
    """(result, seconds) with a device sync after the call."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
