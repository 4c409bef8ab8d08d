"""In-process probe: threshold dipCN from scratch vs list-recycled.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dipcn_lists.py \
        [--n 2504] [--r 2048] [--k 500] [--n-nbr 300] [--iters 20]

Three variants, ONE process, interleaved rounds, device-reduced scalar
sync (docs/perf.md methodology):

- scratch: approx_max_k lists + dipcn_from_distances (the r3 default —
  re-derives both thresholds with ~86 full-matrix passes);
- lists:   approx_max_k lists + dipcn_from_lists (thresholds recycled
  from the lists; ~12 passes over d2);
- step56:  the full fused step-5/6 core (d2 + selection + dipCN) with the
  lists variant — the end-to-end number the cohort step sees.
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_tpu.ops.knn import d2_matrix
    from grid_tpu.ops.select import dipcn_from_distances, dipcn_from_lists
    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    zp_h = np.round(rng.normal(0, 1, (args.n, args.r)) * 100) / 100  # ties
    zp = jnp.asarray(zp_h.astype(np.float32))
    rnorm = jnp.asarray(rng.uniform(0.5, 2.0, args.n).astype(np.float32))
    ok = jnp.ones(args.n, bool)
    d2 = d2_matrix(zp)
    _sync(d2)

    k, n_nbr = args.k, args.n_nbr

    @jax.jit
    def scratch_step(d2):
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=1.0)
        dip, v = dipcn_from_distances(d2, rnorm, rnorm, ok, ok,
                                      k=k, n_nbr=n_nbr)
        return jnp.sum(jnp.where(v, dip, 0)) + jnp.sum(neg) + jnp.sum(idx)

    @jax.jit
    def lists_step(d2):
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=1.0)
        dip, v = dipcn_from_lists(d2, -neg, idx, rnorm, rnorm, ok, ok,
                                  k=k, n_nbr=n_nbr)
        return jnp.sum(jnp.where(v, dip, 0)) + jnp.sum(neg) + jnp.sum(idx)

    @jax.jit
    def step56(zp):
        d2 = d2_matrix(zp)
        neg, idx = jax.lax.approx_max_k(-d2, k, recall_target=1.0)
        dip, v = dipcn_from_lists(d2, -neg, idx, rnorm, rnorm, ok, ok,
                                  k=k, n_nbr=n_nbr)
        return jnp.sum(jnp.where(v, dip, 0)) + jnp.sum(neg) + jnp.sum(idx)

    a = float(_sync(scratch_step(d2)))
    b = float(_sync(lists_step(d2)))
    print(f"parity: scratch {a:.6f} vs lists {b:.6f} (f32 sum-order tol)",
          flush=True)
    _sync(step56(zp))

    variants = (("scratch", scratch_step, d2), ("lists", lists_step, d2),
                ("step56", step56, zp))
    best = {name: float("inf") for name, _, _ in variants}
    for rnd in range(args.rounds):
        for name, fn, arg in variants:
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fn(arg)
            _sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
            print(f"round {rnd} {name}: {dt * 1e3:.2f} ms", flush=True)
    print("BEST " + ", ".join(f"{n} {v*1e3:.2f} ms" for n, v in best.items())
          + f"; scratch/lists {best['scratch']/best['lists']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
