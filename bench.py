"""grid_tpu benchmark: cohort samples/s for normalize + kNN + dipCN.

Measures the BASELINE.json headline metric — steps 4-6 throughput on a
1000G-scale synthetic cohort (N=2504 samples) — on the default accelerator
(one TPU chip under the driver), against the reference-equivalent CPU path
(numpy normalize + sklearn NearestNeighbors + per-sample dipCN loop, the
same libraries and algorithms the reference uses).

Prints ONE JSON line:
    {"metric": ..., "value": samples_per_s, "unit": "samples/s",
     "vs_baseline": speedup_over_cpu_reference,
     "mfu": model_flops_fraction_of_peak, "hbm_util": bandwidth_fraction}

Roofline model (so "fast" is judged against hardware, not vibes):
the step's MXU work is the Gram matmul (2*N^2*R flops); its HBM traffic is
dominated by the selection/bisection passes over the resident [N, N] d2
(~35 full-matrix reads: 31 bisection count passes + tie-cut + masked sums
+ approx_max_k + the initial write) plus a few [N, R] z passes. mfu is
quoted against v5e bf16 peak (197 TFLOP/s), hbm_util against 819 GB/s —
low mfu WITH low hbm_util means the step is latency-bound (sequential
bisection passes), which is the measured regime at N=2504.

Usage: python bench.py [--quick] [--n N] [--r R] [--k K] [--skip-baseline]
"""

from __future__ import annotations

import argparse
import os
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

    # persistent compile cache: once a healthy window has compiled this
    # shape, later runs (and degraded-tunnel windows) skip the compile
    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()

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


def _run_measurement(n, r, k, n_nbr, check):
    """One full measurement in this process; prints an intermediate JSON
    line consumed by the parent."""
    values, mask, reads = make_matrix(n, r)
    t_dev, out = bench_device(values, mask, reads, k, n_nbr)
    import jax

    result = {"t_dev": t_dev, "platform": jax.devices()[0].platform}
    if check:
        t_cpu, cpu_dip = bench_cpu_reference(values, mask, reads, k, n_nbr)
        dev_dip = np.asarray(out.dipcn)
        err = float(np.nanmedian(np.abs(dev_dip - cpu_dip) / np.abs(cpu_dip)))
        result.update({"t_cpu": t_cpu, "dip_err": err})
    print("BENCH_RESULT " + json.dumps(result), flush=True)


def _measure_subprocess(n, r, k, n_nbr, check, force_cpu, timeout_s):
    """Run the measurement in a child process (a hung remote device then
    cannot wedge the bench); returns the parsed result dict or None."""
    import subprocess

    cmd = [
        sys.executable, __file__, "--_worker",
        "--n", str(n), "--r", str(r), "--k", str(k),
    ]
    if not check:
        cmd.append("--skip-baseline")
    env = dict(os.environ)
    if force_cpu:
        env["GRID_TPU_BENCH_FORCE_CPU"] = "1"
    try:
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    print(proc.stdout[-2000:], file=sys.stderr)
    print(proc.stderr[-2000:], file=sys.stderr)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes for smoke runs")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--r", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--device-timeout", type=int, default=1500,
                    help="seconds before falling back to the CPU backend"
                         " (the tunneled chip has minutes-long degraded"
                         " windows; a cold compile must survive one)")
    args = ap.parse_args()

    n = args.n or (512 if args.quick else 2504)
    r = args.r or (256 if args.quick else 2048)
    k = args.k or (50 if args.quick else 500)
    n_nbr = min(300, n - 1)
    k = min(k, n - 1)

    if args._worker:
        if os.environ.get("GRID_TPU_BENCH_FORCE_CPU") == "1":
            import jax

            jax.config.update("jax_platforms", "cpu")
        _run_measurement(n, r, k, n_nbr, check=not args.skip_baseline)
        return

    backend = "accelerator"
    res = _measure_subprocess(n, r, k, n_nbr, not args.skip_baseline, False,
                              args.device_timeout)
    if res is None:
        # remote device hung or died: measure on the host CPU backend so the
        # bench always reports something honest
        print("WARNING: device bench timed out; falling back to CPU backend",
              file=sys.stderr)
        backend = "cpu-fallback"
        res = _measure_subprocess(n, r, k, n_nbr, not args.skip_baseline, True,
                                  args.device_timeout)
    if res is None:
        print(json.dumps({
            "metric": f"normalize+kNN+dipCN cohort throughput (N={n}, R={r}, k={k})",
            "value": None, "unit": "samples/s", "vs_baseline": None,
        }))
        sys.exit(1)

    t_dev = res["t_dev"]
    vs = res.get("t_cpu", float("nan")) / t_dev
    if res.get("dip_err", 0) > 1e-2:
        print(f"WARNING: device/cpu dipCN median rel err {res['dip_err']:.2e}",
              file=sys.stderr)

    metric = f"normalize+kNN+dipCN cohort throughput (N={n}, R={r}, k={k})"
    if backend != "accelerator":
        metric += " [cpu-fallback]"

    # roofline utilization (see module docstring for the traffic model);
    # only meaningful against the TPU peaks
    mfu = hbm_util = None
    if backend == "accelerator" and res.get("platform") == "tpu":
        model_flops = 2.0 * n * n * r
        model_bytes = 35.0 * n * n * 4 + 6.0 * n * r * 4
        mfu = round(model_flops / t_dev / 197e12, 4)
        hbm_util = round(model_bytes / t_dev / 819e9, 4)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(n / t_dev, 1),
                "unit": "samples/s",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "mfu": mfu,
                "hbm_util": hbm_util,
            }
        )
    )


if __name__ == "__main__":
    main()
