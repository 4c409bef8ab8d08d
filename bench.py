"""grid_tpu benchmark: cohort samples/s for normalize + kNN + dipCN.

Measures the BASELINE.json headline metric — steps 4-6 throughput on a
1000G-scale synthetic cohort (N=2504 samples) — on the default accelerator
(one TPU chip under the driver), against the reference-equivalent CPU path
(numpy normalize + sklearn NearestNeighbors + per-sample dipCN loop, the
same libraries and algorithms the reference uses).

Prints ONE JSON line:
    {"metric": ..., "value": samples_per_s, "unit": "samples/s",
     "vs_baseline": speedup_over_cpu_reference}

Usage: python bench.py [--quick] [--n N] [--r R] [--k K] [--skip-baseline]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_matrix(n, r, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(25.0, 35.0, size=(n, 1))
    dose = np.ones((n, r))
    dose[:, : r // 8] = rng.normal(1.0, 0.15, size=(n, r // 8)).clip(0.3, 2.0)
    values = (base * dose * rng.normal(1.0, 0.03, size=(n, r))).clip(0.5, None)
    mask = rng.random((n, r)) > 0.02
    reads = rng.integers(500, 3000, size=n).astype(np.float64)
    return values * mask, mask, reads


def _sync(x):
    """True device sync: read a value back to the host.

    ``jax.block_until_ready`` does not round-trip on remote/tunneled
    backends (it can return once the work is enqueued), so timing loops
    must force a transfer of computed data instead.
    """
    return np.asarray(x).ravel()[0]


def bench_device(values, mask, reads, k, n_nbr, iters=20):
    import jax.numpy as jnp

    from grid_tpu.models.cohort import CohortParams, make_cohort_step
    from grid_tpu.io.hap_neighbors import pad_hap_neighbors

    n = values.shape[0]
    params = CohortParams(
        num_neighbors=k, n_nbr=n_nbr, n_iters=0, quantize=False, row_block=512,
    )
    fn = make_cohort_step(params)

    hap_nbrs = [[] for _ in range(2 * n)]
    hi, hw, hv = pad_hap_neighbors(hap_nbrs, 1)

    dtype = jnp.float32
    args = (
        jnp.asarray(values, dtype=dtype),
        jnp.asarray(mask),
        jnp.asarray(reads, dtype=dtype),
        jnp.ones((n,), dtype=bool),
        jnp.asarray(hi),
        jnp.asarray(hw),
        jnp.asarray(hv),
    )

    # warmup/compile (synced by readback)
    out = fn(*args)
    _sync(out.dipcn)

    # steady-state throughput: enqueue `iters` steps, one true sync at the
    # end; per-step time amortizes the per-dispatch RPC latency of remote
    # backends, which is the honest production-throughput number.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out.dipcn)
    elapsed = (time.perf_counter() - t0) / iters
    return elapsed, out


def bench_cpu_reference(values, mask, reads, k, n_nbr):
    """Reference-equivalent CPU path: numpy NaN normalize + sklearn kNN +
    python dipCN loop (same algorithms/libraries as the reference steps)."""
    from sklearn.neighbors import NearestNeighbors

    n = values.shape[0]
    mat = np.where(mask, values, np.nan)

    t0 = time.perf_counter()
    # normalize (grid/utils/normalize_mosdepth.py:419-476 math)
    row_means = np.nanmean(mat, axis=1)
    x = mat / np.where(row_means == 0, np.nan, row_means)[:, None]
    col_means = np.nanmean(x, axis=0)
    col_vars = np.nansum((x - col_means) ** 2, axis=0) / (n - 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        var_ratio = np.where(col_means > 0, 100.0 * col_vars / col_means, np.nan)
    mu_pos = col_means > 0
    x[:, mu_pos] = (x[:, mu_pos] - col_means[mu_pos]) / np.sqrt(col_means[mu_pos])
    valid = var_ratio[~np.isnan(var_ratio)]
    scale = 1.0 / np.sqrt(np.median(valid) / 100.0) if valid.size else 1.0
    x *= scale
    # selection + clip/fill (steps 4b/5a)
    sorted_r = np.sort(valid)
    thr = sorted_r[min(int(0.1 * len(sorted_r)), len(sorted_r) - 1)]
    sel = np.where(~np.isnan(var_ratio) & (var_ratio > thr))[0]
    z = np.nan_to_num(np.clip(x[:, sel], -2.0, 2.0))
    # kNN (grid/utils/find_neighbors.py:179-227)
    # algorithm="brute": sklearn's auto heuristic picks a tree here, which is
    # pathological in ~2000 dims; brute (GEMM) is its fastest option.
    nbrs = NearestNeighbors(n_neighbors=min(k + 1, n), metric="euclidean", algorithm="brute").fit(z)
    dists, idx = nbrs.kneighbors(z)
    # dipCN (grid/utils/compute_dipcn.py:62-87)
    scales = row_means
    out = np.zeros(n)
    for i in range(n):
        total, cnt = 0.0, 0
        for j in idx[i]:
            if j == i:
                continue
            if cnt >= n_nbr:
                break
            total += reads[j] / scales[j]
            cnt += 1
        out[i] = (reads[i] / scales[i]) / (total / cnt)
    return time.perf_counter() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    n = args.n or (512 if args.quick else 2504)
    r = args.r or (256 if args.quick else 2048)
    k = args.k or (50 if args.quick else 500)
    n_nbr = min(300, n - 1)
    k = min(k, n - 1)

    values, mask, reads = make_matrix(n, r)

    t_dev, out = bench_device(values, mask, reads, k, n_nbr)
    samples_per_s = n / t_dev

    if args.skip_baseline:
        vs = float("nan")
    else:
        t_cpu, cpu_dip = bench_cpu_reference(values, mask, reads, k, n_nbr)
        vs = t_cpu / t_dev
        # sanity: device and CPU-reference dipCN agree
        dev_dip = np.asarray(out.dipcn)
        err = np.nanmedian(np.abs(dev_dip - cpu_dip) / np.abs(cpu_dip))
        if err > 1e-2:
            print(f"WARNING: device/cpu dipCN median rel err {err:.2e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"normalize+kNN+dipCN cohort throughput (N={n}, R={r}, k={k})",
                "value": round(samples_per_s, 1),
                "unit": "samples/s",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
