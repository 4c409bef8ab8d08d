"""Decisive probe v2: every variant's output is REDUCED TO A SCALAR ON
DEVICE before the sync readback, so tunnel transfer time (~40 MB/s!) does
not pollute device timings. v1's array-returning numbers were inflated by
up to 15 ms per 5 MB of output."""

from __future__ import annotations

import argparse
import time

import numpy as np


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
    from grid_tpu.ops.select import dipcn_from_distances

    params = CohortParams(num_neighbors=k, n_nbr=300, n_iters=0,
                          quantize=False, row_block=512)
    step = make_cohort_step(params)
    hi, hw, hv = pad_hap_neighbors([[] for _ in range(2 * n)], 1)
    fa = (jnp.asarray(values, jnp.float32), jnp.asarray(mask),
          jnp.asarray(reads, jnp.float32), jnp.ones((n,), bool),
          jnp.asarray(hi), jnp.asarray(hw), jnp.asarray(hv))

    zp = jnp.asarray(rng.normal(0, 1, (n, r)).astype(np.float32))
    big = np.float32(np.finfo(np.float32).max)

    def d2_of(z):
        sq = jnp.sum(z * z, axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2 * (z @ z.T), 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        return jnp.where(rr == cc, big, d2)

    d2 = jax.block_until_ready(jax.jit(d2_of)(zp))
    _, idx0 = knn_squared(zp, k)
    idx0 = jnp.asarray(np.asarray(idx0))
    readsj = jnp.asarray(reads, jnp.float32)
    scalesj = jnp.asarray(rng.uniform(20, 40, n).astype(np.float32))
    usable = jnp.ones((n,), bool)
    idxn = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))

    from grid_tpu.ops.dipcn import compute_dipcn

    def scal(*xs):
        return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x)
                   for x in xs)

    @jax.jit
    def v_d2(z):
        return scal(d2_of(z))

    @jax.jit
    def v_approx_d2(d):
        nv, ni = jax.lax.approx_max_k(-d, k)
        return scal(nv, ni)

    @jax.jit
    def v_topk_d2(d):
        nv, ni = jax.lax.top_k(-d, k)
        return scal(nv, ni)

    @jax.jit
    def v_sort_d2(d):
        sv, si = jax.lax.sort((d, idxn), dimension=1, num_keys=1, is_stable=True)
        return scal(sv[:, :k], si[:, :k])

    @jax.jit
    def v_knn_panels(z):
        sd, ix = knn_squared(z, k)
        return scal(sd, ix)

    @jax.jit
    def v_dip_gather(idx, reads_, scales_):
        contrib = reads_[idx] / scales_[idx]
        d, _ = compute_dipcn(reads_ / scales_, usable, contrib,
                             jnp.ones(idx.shape, bool), n_nbr=300)
        return scal(d)

    @jax.jit
    def v_dip_thresh(d, reads_, scales_):
        w = reads_ / scales_
        dd, _ = dipcn_from_distances(d, w, w, usable, usable, k, 300)
        return scal(dd)

    @jax.jit
    def v_fused2(z, reads_, scales_):
        """Candidate design: materialize d2 once; approx selection for the
        artifact lists; threshold dipCN — one program."""
        d = d2_of(z)
        nv, ni = jax.lax.approx_max_k(-d, k)
        w = reads_ / scales_
        dd, _ = dipcn_from_distances(d, w, w, usable, usable, k, 300)
        return scal(nv, ni) + scal(dd)

    @jax.jit
    def v_fused2_sort(z, reads_, scales_):
        d = d2_of(z)
        sv, si = jax.lax.sort((d, idxn), dimension=1, num_keys=1, is_stable=True)
        w = reads_ / scales_
        dd, _ = dipcn_from_distances(d, w, w, usable, usable, k, 300)
        return scal(sv[:, :k], si[:, :k]) + scal(dd)

    @jax.jit
    def v_cumsum(d):
        return scal(jnp.cumsum((d < 1000.0).astype(jnp.int32), axis=1))

    gi = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))

    @jax.jit
    def v_gather(d, g):
        return scal(jnp.take_along_axis(d, g, axis=1))

    variants = {
        "cohort_step": (lambda: step(*fa).dipcn),
        "d2_full": (lambda: v_d2(zp)),
        "approx_on_d2": (lambda: v_approx_d2(d2)),
        "topk_on_d2": (lambda: v_topk_d2(d2)),
        "sort_on_d2": (lambda: v_sort_d2(d2)),
        "knn_panels": (lambda: v_knn_panels(zp)),
        "dip_gather": (lambda: v_dip_gather(idx0, readsj, scalesj)),
        "dip_thresh": (lambda: v_dip_thresh(d2, readsj, scalesj)),
        "fused2_approx": (lambda: v_fused2(zp, readsj, scalesj)),
        "fused2_sort": (lambda: v_fused2_sort(zp, readsj, scalesj)),
        "cumsum": (lambda: v_cumsum(d2)),
        "gather_nk": (lambda: v_gather(d2, gi)),
    }

    def _sync(x):
        return np.asarray(x).ravel()[0]

    times = {name: [] for name in variants}
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
