"""row_block x col_block sweep for exact kNN at N=65536 (scalar sync)."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from grid_tpu.utils.device import enable_compilation_cache
    from grid_tpu.ops.knn import knn_squared
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    n, r, k = 65536, 1024, 500
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 1, (n, r)).astype(np.float32))
    cfgs = [(512, 8192), (1024, 8192), (2048, 8192), (1024, 4096), (1024, 16384)]
    fns = {}
    for rb, cb in cfgs:
        def mk(rb=rb, cb=cb):
            @jax.jit
            def run(z):
                d, i = knn_squared(z, k, row_block=rb, col_block=cb)
                return jnp.sum(d)
            return run
        fns[(rb, cb)] = mk()
    for (rb, cb), fn in fns.items():
        t0 = time.perf_counter(); np.asarray(fn(z))
        print(f"rb={rb} cb={cb} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    for rnd in range(2):
        for (rb, cb), fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(2):
                out = fn(z)
            np.asarray(out)
            print(f"round {rnd} rb={rb} cb={cb}: {(time.perf_counter()-t0)/2*1e3:.0f} ms", flush=True)

if __name__ == "__main__":
    main()
