"""Measure lax.sort cost vs payload width + the post-sort feature gather.

Decides whether blend features should ride the sort as payload (slot-order
features are free out of the expansion kernel) or be gathered after by
sorted gaussian id (~6.5 ns/row XLA gather floor).

Variants at a given capacity E:
  sort3   — (tile, depth) keys + id payload           [current]
  sort12  — (tile, depth) keys + id + 9 f32 payloads  [feature-carry]
  gather  — [E, 10] f32 row gather by sorted id       [current post step]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench(name, fn, iters=6):
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + fn(i)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); float(f(jnp.int32(1))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(jnp.int32(iters + 1))); tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / iters * 1e3:.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=4_245_463)  # train7k_720p
    ap.add_argument("--ntiles", type=int, default=3600)
    ap.add_argument("--n", type=int, default=559_263)
    args = ap.parse_args()
    e, n = args.cap, args.n
    print(f"device={jax.devices()[0]} E={e} N={n}", flush=True)

    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, args.ntiles, size=e).astype(np.uint32))
    depth = jnp.asarray(rng.integers(0, 2**32, size=e, dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, n, size=e).astype(np.uint32))
    feats_slot = [
        jnp.asarray(rng.standard_normal(e).astype(np.float32)) for _ in range(9)
    ]
    table = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))

    def sort3(i):
        t, d, x = lax.sort((tile, depth + i.astype(jnp.uint32), idx),
                           dimension=0, num_keys=2, is_stable=True)
        return jnp.sum(x[:8].astype(jnp.float32))

    def sort12(i):
        ops = lax.sort(
            (tile, depth + i.astype(jnp.uint32), idx, *feats_slot),
            dimension=0, num_keys=2, is_stable=True,
        )
        return jnp.sum(ops[2][:8].astype(jnp.float32)) + jnp.sum(ops[5][:8])

    def gather(i):
        ids = (idx + i.astype(jnp.uint32)) % jnp.uint32(n)
        rows = table[ids.astype(jnp.int32)]
        return jnp.sum(rows[:8])

    bench("sort3", sort3)
    bench("gather [E,10]", gather, iters=10)
    bench("sort12 (feature-carry)", sort12, iters=4)


if __name__ == "__main__":
    main()
