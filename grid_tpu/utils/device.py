"""Device selection and compilation-cache policy.

Two production concerns the reference never had:

- **Compile latency**: XLA compiles each (shape, fn) once; over a tunneled
  TPU the round trip can be tens of seconds. A persistent compilation cache
  (enabled once per process) makes re-runs and resumes instant.
- **Tiny workloads**: a locus-restricted cohort matrix can be a few KB —
  dispatching it to an accelerator buys nothing and pays compile+transfer.
  ``step_device`` places step math on CPU below a size threshold (the
  ``device.platform: auto`` policy), on the accelerator above it.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from pathlib import Path

# Workloads below this many matrix elements run on CPU under "auto".
AUTO_CPU_THRESHOLD = int(os.environ.get("GRID_TPU_AUTO_CPU_THRESHOLD", 2_000_000))

_CACHE_INITIALIZED = False


def enable_compilation_cache(cache_dir=None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GRID_TPU_COMPILE_CACHE", str(Path.home() / ".cache" / "grid_tpu_xla")
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_INITIALIZED = True
    except Exception:
        pass  # older jax or read-only home: run without the cache


def resolve_dtype(config: dict | None):
    """Map device.dtype to a numpy/jnp dtype, or None for "auto" (keep the
    staged arrays' dtype: float64 on the x64 CPU backend, float32 on TPU)."""
    import numpy as np

    name = "auto"
    if config:
        name = str(config.get("device", {}).get("dtype", "auto")).lower()
    if name in ("auto", "none", ""):
        return None
    import jax.numpy as jnp

    table = {
        "float32": np.float32,
        "f32": np.float32,
        "float64": np.float64,
        "f64": np.float64,
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
    }
    if name not in table:
        raise ValueError(f"unknown device.dtype {name!r}")
    return table[name]


@contextmanager
def step_device(config: dict | None, workload_elems: int):
    """Context manager placing jax computations for one pipeline step.

    ``device.platform`` config values:
        - "auto" (default): CPU when workload_elems < AUTO_CPU_THRESHOLD,
          default accelerator otherwise;
        - "cpu": always host;
        - "default"/"tpu": leave placement alone.
    """
    import jax

    platform = "auto"
    if config:
        platform = str(config.get("device", {}).get("platform", "auto")).lower()

    use_cpu = platform == "cpu" or (
        platform == "auto"
        and workload_elems < AUTO_CPU_THRESHOLD
        and jax.default_backend() != "cpu"
    )
    if use_cpu:
        with jax.default_device(jax.devices("cpu")[0]):
            yield "cpu"
    else:
        yield jax.default_backend()
