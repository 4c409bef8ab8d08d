"""Probe top-k selection variants on the real TPU (one process, synced
readback). Decides the design of the fused distance+selection path
(VERDICT r1 item #1). Usage:

    python scripts/probe_selection.py [--n 2504] [--r 2048] [--k 500]
                                      [--iters 10] [--variants a,b,...]

Variants:
  knn        : current knn_squared end to end (baseline)
  approx     : lax.approx_max_k on a precomputed d2 [N, N]
  approx_bf16: same on bfloat16 keys
  topk       : lax.top_k on d2
  sort       : jax.lax.sort (full row sort, f32 key + i32 payload)
  approx_k128: approx_max_k with k=128 (k-dependence probe)
  bisect     : 31-step per-row threshold bisection on int32-bitcast keys
  bisect8    : 8-round 16-way bisection (same result, fewer passes)
  cumsum     : row cumsum of a bool mask (compaction ingredient)
  gather     : take_along_axis of [N, k] from [N, N]
  butterfly  : log-shift candidate compaction (11 steps, ingredient)
  narrow     : approx_max_k on [N, 1280] (post-compaction selection size)
  sort_narrow: lax.sort on [N, 512] (final candidate ordering)
  fused_bisect: full bisect+compact+order pipeline (the candidate design)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    return np.asarray(x).ravel()[0]


def timeit(fn, args, iters, name, results):
    import jax

    try:
        out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:14s} {dt * 1e3:9.2f} ms", flush=True)
        results[name] = dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2504)
    ap.add_argument("--r", type=int, default=2048)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from grid_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    n, r, k = args.n, args.r, args.k
    rng = np.random.default_rng(0)
    z_host = rng.normal(0, 1, (n, r)).astype(np.float32)
    z = jnp.asarray(z_host)

    @jax.jit
    def dist2(z):
        sq = jnp.sum(z * z, axis=1)
        g = z @ z.T
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2 * g, 0)
        big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
        eye_r = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        eye_c = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        return jnp.where(eye_r == eye_c, big, d2)

    d2 = jax.block_until_ready(dist2(z))
    _sync(d2)

    results = {}
    want = set(args.variants.split(",")) if args.variants else None

    def on(name):
        return want is None or name in want

    if on("knn"):
        from grid_tpu.ops.knn import knn_squared

        timeit(partial(knn_squared, k=k), (z,), args.iters, "knn", results)

    if on("approx"):
        timeit(jax.jit(lambda d: jax.lax.approx_max_k(-d, k)), (d2,),
               args.iters, "approx", results)
    if on("approx_bf16"):
        timeit(jax.jit(lambda d: jax.lax.approx_max_k(-d.astype(jnp.bfloat16), k)),
               (d2,), args.iters, "approx_bf16", results)
    if on("topk"):
        timeit(jax.jit(lambda d: jax.lax.top_k(-d, k)), (d2,),
               args.iters, "topk", results)
    if on("sort"):
        idx0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))

        @jax.jit
        def full_sort(d):
            sv, si = jax.lax.sort((d, idx0), dimension=1, num_keys=1)
            return sv[:, :k], si[:, :k]

        timeit(full_sort, (d2,), args.iters, "sort", results)
    if on("approx_k128"):
        timeit(jax.jit(lambda d: jax.lax.approx_max_k(-d, 128)), (d2,),
               args.iters, "approx_k128", results)

    if on("bisect"):
        @jax.jit
        def bisect31(d):
            u = jax.lax.bitcast_convert_type(d, jnp.int32)  # monotone (d>=0)

            def body(i, lohi):
                lo, hi = lohi
                mid = lo + (hi - lo) // 2
                cnt = jnp.sum(u <= mid[:, None], axis=1)
                return jnp.where(cnt >= k, lo, mid + 1), jnp.where(cnt >= k, mid, hi)

            lo = jnp.zeros((n,), jnp.int32)
            hi = jnp.full((n,), np.int32(2**31 - 1))
            lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
            return hi

        timeit(bisect31, (d2,), args.iters, "bisect", results)

    if on("bisect8"):
        @jax.jit
        def bisect8(d):
            u = jax.lax.bitcast_convert_type(d, jnp.int32)

            def body(i, lohi):
                lo, hi = lohi  # [n] each; probe 15 interior points
                span = (hi - lo) // 16
                probes = lo[:, None] + span[:, None] * jnp.arange(1, 16)[None, :]
                # cnt[q] = #(u <= probes[q]) ; one pass, 15 compare+sums
                cnt = jnp.sum(
                    (u[:, :, None] <= probes[:, None, :]).astype(jnp.int32), axis=1
                )
                ge = cnt >= k  # first probe index meeting k
                first = jnp.argmax(ge, axis=1)
                any_ge = jnp.any(ge, axis=1)
                pl = jnp.take_along_axis(probes, first[:, None], 1)[:, 0]
                new_hi = jnp.where(any_ge, pl, hi)
                below = jnp.where(first > 0,
                                  jnp.take_along_axis(probes, jnp.maximum(first - 1, 0)[:, None], 1)[:, 0] + 1,
                                  lo)
                new_lo = jnp.where(any_ge, below, probes[:, -1] + 1)
                return new_lo, new_hi

            lo = jnp.zeros((n,), jnp.int32)
            hi = jnp.full((n,), np.int32(2**31 - 1))
            lo, hi = jax.lax.fori_loop(0, 8, body, (lo, hi))
            return hi

        timeit(bisect8, (d2,), args.iters, "bisect8", results)

    if on("cumsum"):
        timeit(jax.jit(lambda d: jnp.cumsum((d < 1000.0).astype(jnp.int32), axis=1)),
               (d2,), args.iters, "cumsum", results)
    if on("gather"):
        gi = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))
        timeit(jax.jit(lambda d, g: jnp.take_along_axis(d, g, axis=1)),
               (d2, gi), args.iters, "gather", results)

    if on("narrow"):
        d2n = d2[:, :1280]
        timeit(jax.jit(lambda d: jax.lax.approx_max_k(-d, k)), (d2n,),
               args.iters, "narrow", results)
    if on("sort_narrow"):
        w = 512
        d2w = d2[:, :w]
        idxw = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (n, w))

        @jax.jit
        def sortw(d):
            return jax.lax.sort((d, idxw), dimension=1, num_keys=1)

        timeit(sortw, (d2w,), args.iters, "sort_narrow", results)

    if on("fused_bisect"):
        from grid_tpu.ops.select import sorted_smallest_k

        timeit(partial(sorted_smallest_k, k=k), (d2,), args.iters,
               "fused_bisect", results)
    if on("knn_bisect"):
        from grid_tpu.ops.knn import knn_squared

        timeit(partial(knn_squared, k=k, selector="bisect"), (z,),
               args.iters, "knn_bisect", results)

    print("RESULTS", {kk: round(v * 1e3, 2) for kk, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
