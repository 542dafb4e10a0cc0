"""Round-3 sort design probes (v5e, axon tunnel).

Questions, in service of the VERDICT's "build a real sort" item:
  1. How does the 3-key unstable sort scale with capacity (13.3M vs 14.19M)
     — i.e. what does tightening capacity_slack buy?
  2. Is XLA's TPU sort cost ~log2(n)^2 per element — i.e. would a
     chunked-sort + merge formulation even have headroom?  Batched
     [C, W] sorts measure the chunk phase's cost in isolation.
  3. Single u16 key + u32 payload stable (the "pre-depth-sorted gaussians,
     tile-group-only" formulation's inner sort).

Timing: chained-dispatch protocol (dispatch N, fetch one scalar, subtract
1-run) — the fori-wrapped variant hangs the remote compile helper at this
scale.  Operands as explicit jit args (closure capture hangs the helper).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def bench(name, fn, *args, iters=4):
    f = jax.jit(fn)

    def run(k):
        d = None
        for i in range(k):
            d = f(jnp.uint32(i), *args)
        return float(d)

    t0 = time.perf_counter()
    run(1)
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters + 1); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def make(n):
        t = rng.integers(0, 8160, n).astype(np.uint16)
        d = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        i = rng.permutation(n).astype(np.uint32)
        return jnp.asarray(t), jnp.asarray(d), jnp.asarray(i)

    def sort3(s, t, d, i):
        st, sd, si = jax.lax.sort(
            (t, d + s, i), dimension=0, num_keys=3, is_stable=False
        )
        return jnp.sum(si[:8].astype(jnp.float32))

    # 1. capacity scaling
    for n in (14_190_624, 13_360_000, 11_000_000):
        t, d, i = make(n)
        bench(f"sort3 u16/u32/u32 n={n/1e6:.2f}M", sort3, t, d, i)
        del t, d, i

    # 3. single u16 key + u32 payload, stable (tile-grouping inner sort)
    n = 14_190_624
    t, d, i = make(n)

    def sort_tile_stable(s, t, i):
        st, si = jax.lax.sort(
            (t, i + s), dimension=0, num_keys=1, is_stable=True
        )
        return jnp.sum(si[:8].astype(jnp.float32))

    bench("sort u16 key + u32 payload stable n=14.19M", sort_tile_stable, t, i)

    # 2. batched chunk sorts (same total element count, 3 columns)
    for chunks, w in ((1728, 8192), (3456, 4096), (432, 32768)):
        n = chunks * w
        tt, dd, ii = make(n)
        t2 = tt.reshape(chunks, w)
        d2 = dd.reshape(chunks, w)
        i2 = ii.reshape(chunks, w)

        def sortb(s, t2, d2, i2):
            st, sd, si = jax.lax.sort(
                (t2, d2 + s, i2), dimension=1, num_keys=3, is_stable=False
            )
            return jnp.sum(si[:, :1].astype(jnp.float32))

        bench(f"batched sort3 [{chunks},{w}] ({n/1e6:.2f}M)", sortb, t2, d2, i2)
        del tt, dd, ii, t2, d2, i2


if __name__ == "__main__":
    main()
