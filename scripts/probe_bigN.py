"""Large-N kNN timing with DEVICE-REDUCED sync (the r1 numbers at N=65k
included a ~130 MB result readback over the ~40 MB/s tunnel)."""
import argparse, time
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--r", type=int, default=1024)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from grid_tpu.utils.device import enable_compilation_cache
    from grid_tpu.ops.knn import knn_squared
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 1, (args.n, args.r)).astype(np.float32))

    @jax.jit
    def run(z):
        d, i = knn_squared(z, args.k)
        return jnp.sum(d) + jnp.sum(i.astype(jnp.float32))

    @jax.jit
    def run_flat(z):
        d, i = knn_squared(z, args.k, col_block=0) if False else knn_squared(z, args.k)
        return jnp.sum(d)

    t0 = time.perf_counter(); _ = np.asarray(run(z)); print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    for rnd in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(z)
        _ = np.asarray(out)
        print(f"round {rnd}: {(time.perf_counter()-t0)/args.iters*1e3:.0f} ms", flush=True)

if __name__ == "__main__":
    main()
