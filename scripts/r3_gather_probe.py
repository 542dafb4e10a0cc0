"""Where do the 20 ns/row of 'feature gather+pack' go? (v5e)

Decomposes the capped path's feature build at bench-like sizes
(table [5.8M, 10] f32, ep = 6.27M indices):
  a. row-gather alone:           take(table[N,10], idx, axis=0)
  b. transpose alone:            [ep, 10] -> [10, ep]
  c. feature-major table gather: take(tableT[10,N], idx, axis=1)
  d. full features_from_rows (gather + mask + transpose + pad)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

N = 5_834_784
EP = 6_270_464


def bench(name, fn, *args, iters=6):
    f = jax.jit(fn)

    def run(k):
        d = None
        for i in range(k):
            d = f(jnp.float32(i), *args)
        return float(d)

    t0 = time.perf_counter()
    run(1)
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters + 1); tn = time.perf_counter() - t0
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    tableT = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))
    idx = jnp.asarray(rng.integers(0, N, EP).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(EP, 10)).astype(np.float32))

    def ga(s, table, idx):
        r = jnp.take(table, idx, axis=0, mode="clip")
        return jnp.sum(r[:8, :]) + s * 0

    bench("a. row-gather [N,10] by 6.27M idx", ga, table, idx)

    def gb(s, rows):
        t = (rows + s).T
        return jnp.sum(t[:, :8])

    bench("b. transpose [6.27M,10] -> [10, 6.27M]", gb, rows)

    def gc(s, tableT, idx):
        r = jnp.take(tableT, idx, axis=1, mode="clip")
        return jnp.sum(r[:, :8]) + s * 0

    bench("c. lane-gather [10,N] by 6.27M idx", gc, tableT, idx)

    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

    def gd(s, table, idx):
        r = jnp.take(table, idx, axis=0, mode="clip")
        feat = bk.features_from_rows(r + s, None, 512)
        return jnp.sum(feat[:, :8])

    bench("d. gather + features_from_rows", gd, table, idx)

    def ge(s, rows):
        feat = bk.features_from_rows(rows + s, None, 512)
        return jnp.sum(feat[:, :8])

    bench("e. features_from_rows alone", ge, rows)


if __name__ == "__main__":
    main()
