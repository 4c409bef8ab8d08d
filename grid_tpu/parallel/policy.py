"""Measured dispatch policy: flat (single-device) vs ring (sharded) kNN.

The mesh sweep (docs/perf.md "Parallel-layer shape scaling") measured the
ring kNN LOSING 2x to the single-device op at N=8,192 and winning 1.8x at
N=32,768 on an 8-device mesh: below a cohort-size crossover the ring's
per-step collective + merge overhead dominates the O(N^2 R / n_dev) work it
saves. A config that sets ``device.mesh_shape`` for a small cohort would
silently pay that 2x, so the fused step consults this policy instead of
following the config blindly.

The crossover is encoded as a row count (geometric midpoint of the two
measured points). It is a property of the ratio collective-latency :
matmul-throughput, which is far MORE favorable to the ring on real ICI
(microsecond collectives) than on the CPU mesh it was measured on — so
flat-below-16k is the conservative choice on both backends: where the
constant errs, it errs toward the path that is never 2x wrong.

``device.dispatch: flat|ring`` overrides the policy for measurement runs.
"""

from __future__ import annotations

# Measured on the 8-virtual-device CPU mesh (scripts/bench_mesh_sweep.py):
# flat 0.64 s vs ring 1.28 s at N=8,192; flat 12.3 s vs ring 6.7 s at
# N=32,768. Geometric midpoint of the bracketing measurements.
RING_CROSSOVER_N = 16_384


def choose_cohort_execution(n: int, n_devices: int, dispatch: str = "auto") -> str:
    """Pick ``"flat"`` or ``"ring"`` for a cohort of ``n`` rows.

    Args:
        n: cohort row count.
        n_devices: devices in the configured mesh (1 forces flat).
        dispatch: ``auto`` applies the measured crossover; ``flat``/``ring``
            force a path (e.g. for sweeps re-measuring the crossover).
    """
    if dispatch not in ("auto", "flat", "ring"):
        raise ValueError(f"device.dispatch must be auto|flat|ring, got {dispatch!r}")
    if n_devices <= 1:
        if dispatch == "ring":
            raise ValueError("device.dispatch: ring requires a multi-device mesh")
        return "flat"
    if dispatch != "auto":
        return dispatch
    return "ring" if n >= RING_CROSSOVER_N else "flat"
