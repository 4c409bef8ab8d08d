"""Break down the fused cohort step cost on the real TPU: normalize-only,
kNN-only, dipCN-gather-only, full step; plus approx_max_k
reduction_input_size_override values. One process, synced readbacks."""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    return np.asarray(x).ravel()[0]


def timeit(fn, args, iters, name):
    try:
        out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:22s} {dt * 1e3:9.2f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2504)
    ap.add_argument("--r", type=int, default=2048)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    n, r, k = args.n, args.r, args.k
    rng = np.random.default_rng(0)

    import bench as benchmod  # repo-root bench helpers

    values, mask, reads = benchmod.make_matrix(n, r)

    from grid_tpu.io.hap_neighbors import pad_hap_neighbors
    from grid_tpu.models.cohort import CohortParams, make_cohort_step
    from grid_tpu.ops.normalize import normalize_cohort
    from grid_tpu.ops.knn import knn_squared, prepare_z

    params = CohortParams(num_neighbors=k, n_nbr=300, n_iters=0,
                          quantize=False, row_block=512)
    step = make_cohort_step(params)
    hi, hw, hv = pad_hap_neighbors([[] for _ in range(2 * n)], 1)
    fa = (jnp.asarray(values, jnp.float32), jnp.asarray(mask),
          jnp.asarray(reads, jnp.float32), jnp.ones((n,), bool),
          jnp.asarray(hi), jnp.asarray(hw), jnp.asarray(hv))

    timeit(lambda *a: step(*a).dipcn, fa, args.iters, "cohort_step(full)")

    vj = jnp.asarray(values, jnp.float32)
    mj = jnp.asarray(mask)
    timeit(jax.jit(lambda v, m: normalize_cohort(v, m).z), (vj, mj),
           args.iters, "normalize")

    z = np.asarray(jax.jit(lambda v, m: normalize_cohort(v, m).z)(vj, mj))
    zp_host = np.nan_to_num(np.clip(z, -2, 2)).astype(np.float32)
    zp = jnp.asarray(zp_host)
    timeit(partial(knn_squared, k=k), (zp,), args.iters, "knn(approx)")

    _, idx = knn_squared(zp, k)
    idx = jnp.asarray(np.asarray(idx))
    readsj = jnp.asarray(reads, jnp.float32)
    scalesj = jnp.asarray(rng.uniform(20, 40, n).astype(np.float32))

    from grid_tpu.ops.dipcn import compute_dipcn

    @jax.jit
    def dip_from_idx(idx, reads, scales):
        contrib = reads[idx] / scales[idx]
        usable = jnp.ones(idx.shape, bool)
        return compute_dipcn(reads / scales, jnp.ones((n,), bool), contrib,
                             usable, n_nbr=300)[0]

    timeit(dip_from_idx, (idx, readsj, scalesj), args.iters, "dipcn(gather)")

    # approx_max_k reduction_input_size_override sweep on one [512, N] panel
    d2p = jnp.asarray(rng.gamma(3, 1, (512, n)).astype(np.float32))
    for ov in (-1, 1024, 2048, 4096):
        kw = {} if ov == -1 else {"reduction_input_size_override": ov}
        timeit(jax.jit(lambda d, kw=kw: jax.lax.approx_max_k(-d, k, **kw)),
               (d2p,), args.iters, f"panel_approx ov={ov}")
    timeit(jax.jit(lambda d: jax.lax.top_k(-d, k)), (d2p,), args.iters,
           "panel_topk")
    idxp = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (512, n))
    timeit(jax.jit(lambda d: jax.lax.sort((d, idxp), dimension=1, num_keys=1)),
           (d2p,), args.iters, "panel_sort")

    # MXU prefix-sum: mask @ upper-triangular ones
    maskf = (d2p < 2.0).astype(jnp.float32)
    triu = jnp.triu(jnp.ones((n, n), jnp.float32))

    timeit(jax.jit(lambda m, t: m @ t), (maskf, triu), args.iters,
           "mxu_prefix[512xN]")

    # threshold-sum dipCN ingredient: bisect + masked matvec
    from grid_tpu.ops.select import _kth_smallest_key

    @jax.jit
    def thresh_sum(d, w):
        u = jax.lax.bitcast_convert_type(d, jnp.int32)
        t = _kth_smallest_key(u, 300)
        m = (u <= t[:, None]).astype(jnp.float32)
        return m @ w, jnp.sum(m, axis=1)

    w = jnp.asarray(rng.uniform(0, 2, n).astype(np.float32))
    timeit(thresh_sum, (d2p, w), args.iters, "bisect+matvec[512xN]")


if __name__ == "__main__":
    main()
