"""In-process probe: XLA threshold dipCN vs the Pallas VMEM-resident kernel.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_pallas_dipcn.py \
        [--n 2504] [--r 2048] [--k 500] [--n-nbr 300] [--iters 20]

Methodology per docs/perf.md: both variants in ONE process, interleaved
over rounds, synchronized by a device-reduced scalar readback.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    return np.asarray(x).ravel()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2504)
    ap.add_argument("--r", type=int, default=2048)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--n-nbr", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_tpu.ops.knn import d2_matrix
    from grid_tpu.ops.pallas_select import dipcn_from_distances_pallas
    from grid_tpu.ops.select import dipcn_from_distances
    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    zp = jnp.asarray(rng.normal(0, 1, (args.n, args.r)).astype(np.float32))
    rnorm = jnp.asarray(rng.uniform(0.5, 2.0, args.n).astype(np.float32))
    ok = jnp.ones(args.n, bool)
    d2 = d2_matrix(zp)
    _sync(d2)

    @jax.jit
    def xla_step(d2):
        dip, v = dipcn_from_distances(d2, rnorm, rnorm, ok, ok,
                                      k=args.k, n_nbr=args.n_nbr)
        return jnp.sum(jnp.where(v, dip, 0))

    @jax.jit
    def pallas_step(d2):
        dip, v = dipcn_from_distances_pallas(d2, rnorm, rnorm, ok, ok,
                                             k=args.k, n_nbr=args.n_nbr,
                                             row_block=args.block)
        return jnp.sum(jnp.where(v, dip, 0))

    # parity first
    a = float(_sync(xla_step(d2)))
    b = float(_sync(pallas_step(d2)))
    print(f"parity: xla sum {a:.6f} vs pallas sum {b:.6f}", flush=True)

    best = {"xla": float("inf"), "pallas": float("inf")}
    for rnd in range(args.rounds):
        for name, fn in (("xla", xla_step), ("pallas", pallas_step)):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(d2)
            _sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
            print(f"round {rnd} {name}: {dt * 1e3:.2f} ms", flush=True)
    print(f"BEST xla {best['xla']*1e3:.2f} ms, pallas {best['pallas']*1e3:.2f} ms, "
          f"ratio {best['xla']/best['pallas']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
