"""Decisive single-process comparison of the fused-step designs on the real
TPU. Interleaves variants over 3 rounds and reports min/median per variant
(the tunnel drifts between processes — only within-process comparisons
count, docs/perf.md)."""

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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    n, r, k = args.n, args.r, args.k
    rng = np.random.default_rng(0)

    import bench as benchmod

    values, mask, reads = benchmod.make_matrix(n, r)
    from grid_tpu.io.hap_neighbors import pad_hap_neighbors
    from grid_tpu.models.cohort import CohortParams, make_cohort_step
    from grid_tpu.ops.knn import knn_squared
    from grid_tpu.ops.select import dipcn_from_distances, sorted_smallest_k

    params = CohortParams(num_neighbors=k, n_nbr=300, n_iters=0,
                          quantize=False, row_block=512)
    step = make_cohort_step(params)
    hi, hw, hv = pad_hap_neighbors([[] for _ in range(2 * n)], 1)
    fa = (jnp.asarray(values, jnp.float32), jnp.asarray(mask),
          jnp.asarray(reads, jnp.float32), jnp.ones((n,), bool),
          jnp.asarray(hi), jnp.asarray(hw), jnp.asarray(hv))

    zp = jnp.asarray(rng.normal(0, 1, (n, r)).astype(np.float32))

    @jax.jit
    def d2_full(z):
        sq = jnp.sum(z * z, axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2 * (z @ z.T), 0)
        big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
        rr = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        return jnp.where(rr == cc, big, d2)

    d2 = jax.block_until_ready(d2_full(zp))
    _, idx0 = knn_squared(zp, k)
    idx0 = jnp.asarray(np.asarray(idx0))
    readsj = jnp.asarray(reads, jnp.float32)
    scalesj = jnp.asarray(rng.uniform(20, 40, n).astype(np.float32))
    usable = jnp.ones((n,), bool)

    from grid_tpu.ops.dipcn import compute_dipcn

    @jax.jit
    def dip_gather(idx, reads_, scales_):
        contrib = reads_[idx] / scales_[idx]
        return compute_dipcn(reads_ / scales_, usable, contrib,
                             jnp.ones(idx.shape, bool), n_nbr=300)[0]

    @jax.jit
    def dip_thresh(d, reads_, scales_):
        w = reads_ / scales_
        return dipcn_from_distances(d, w, w, usable, usable, k, 300)[0]

    variants = {
        "cohort_step": (lambda: step(*fa).dipcn),
        "d2_full": (lambda: d2_full(zp)),
        "knn_approx": (lambda: knn_squared(zp, k)[0]),
        "knn_bisect": (lambda: knn_squared(zp, k, selector="bisect")[0]),
        "sortedk_on_d2": (lambda: sorted_smallest_k(d2, k)[0]),
        "dip_gather": (lambda: dip_gather(idx0, readsj, scalesj)),
        "dip_thresh": (lambda: dip_thresh(d2, readsj, scalesj)),
    }

    times = {name: [] for name in variants}
    # compile pass
    for name, fn in variants.items():
        t0 = time.perf_counter()
        _sync(fn())
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s", flush=True)

    for rnd in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            _sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(f"round {rnd} {name:14s} {dt * 1e3:8.2f} ms", flush=True)

    print("\n=== min over rounds ===", flush=True)
    for name, ts in times.items():
        print(f"{name:14s} min {min(ts)*1e3:8.2f}  med {sorted(ts)[len(ts)//2]*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
