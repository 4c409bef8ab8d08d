"""Per-step timing and profiling hooks.

The reference has no tracing/profiling subsystem (SURVEY §5); grid_tpu makes
step timing and ``jax.profiler`` traces first-class:

- ``StepTimer`` accumulates wall-clock per named step and can dump a JSON
  report next to pipeline artifacts.
- ``step_timer`` context manager, optionally wrapping a ``jax.profiler``
  trace when ``GRID_TPU_PROFILE_DIR`` is set.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from pathlib import Path


class StepTimer:
    """Accumulates per-step wall-clock timings across a pipeline run."""

    def __init__(self):
        self.timings: dict[str, float] = {}

    def record(self, name: str, seconds: float) -> None:
        self.timings[name] = self.timings.get(name, 0.0) + seconds

    def report(self) -> dict[str, float]:
        return dict(self.timings)

    def dump(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.timings, f, indent=2, sort_keys=True)


@contextmanager
def step_timer(name: str, timer: StepTimer | None = None, console=None):
    """Time a pipeline step; optionally emit a jax.profiler trace.

    Set ``GRID_TPU_PROFILE_DIR`` to capture a TensorBoard-compatible device
    trace for the step (one subdirectory per step name).
    """
    profile_dir = os.environ.get("GRID_TPU_PROFILE_DIR")
    trace_ctx = None
    if profile_dir:
        import jax

        trace_ctx = jax.profiler.trace(str(Path(profile_dir) / name))
        trace_ctx.__enter__()
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        if trace_ctx is not None:
            trace_ctx.__exit__(None, None, None)
        if timer is not None:
            timer.record(name, elapsed)
        if console is not None:
            from grid_tpu.utils.logging import log

            log(console, f"[{name}] {elapsed:.2f}s", style="info")
