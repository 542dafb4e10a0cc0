"""lax.sort throughput probe at pipeline scales (see micro_bench.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)


def bench_sort(e, iters=3):
    tile = jnp.asarray(rng.integers(0, 8160, e).astype(np.uint32))
    depth = jnp.asarray(rng.integers(0, 2**32 - 1, e).astype(np.uint32))
    idx = jnp.arange(e, dtype=jnp.uint32)

    def run(n):
        def body(i, acc):
            t2 = tile + (acc * jnp.float32(1e-20)).astype(jnp.uint32)
            st, sd, si = lax.sort(
                (t2, depth, idx), dimension=0, num_keys=2, is_stable=True
            )
            return acc * jnp.float32(1e-20) + jnp.sum(sd[:8].astype(jnp.float32))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"e={e}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"e={e}: lax.sort 2key stable = {dt*1e3:.1f} ms ({e/dt/1e6:.0f} M/s)", flush=True)


bench_sort(1_000_000)
bench_sort(13_000_000, iters=2)
