"""Sort-strategy probes: batched per-row sort vs flat; XLA scatter/gather.

Decides the design of the performance sort tier:
  (a) batched 3-key sort [68 rows, 256K] along the minor dim — the
      "per-tile-row" decomposition (tile_x, depth, idx);
  (b) flat 13.4M non-pow2 3-array sort (capacity without pow2 rounding);
  (c) 13M-unique-index scatter (apply a permutation by scatter);
  (d) 13M row gather of 12B payloads (apply a permutation by gather).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)


def bench(name, fn, iters=3):
    print(f"  [{name}] compiling...", flush=True)

    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + fn(acc * jnp.float32(1e-20))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)

    # (c) scatter a permutation: 13M unique indices
    e = 13_000_000
    perm = jnp.asarray(rng.permutation(e).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**31, e).astype(np.uint32))

    def scatter_perm(s):
        out = jnp.zeros((e,), jnp.uint32).at[perm].set(
            vals + (s * 0).astype(jnp.uint32), unique_indices=True, mode="drop"
        )
        return jnp.sum(out[:4].astype(jnp.float32))

    bench("scatter 13M unique u32", scatter_perm)

    # (a) batched per-row sort: 68 rows x 256K, 3-key
    rows, per = 68, 1 << 18
    tx = jnp.asarray(rng.integers(0, 120, (rows, per)).astype(np.uint32))
    dp = jnp.asarray(rng.integers(0, 2**32 - 1, (rows, per)).astype(np.uint32))
    ix = jnp.asarray(
        np.broadcast_to(np.arange(per, dtype=np.uint32), (rows, per)).copy()
    )

    def batched_sort(s):
        t2 = tx + (s * 0).astype(jnp.uint32)
        st, sd, si = lax.sort((t2, dp, ix), dimension=1, num_keys=3, is_stable=False)
        return jnp.sum(si[:, :4].astype(jnp.float32))

    bench(f"batched sort [{rows},{per}] 3key", batched_sort)

    # (b) flat non-pow2 sort 13.4M
    e2 = 13_400_000
    t_f = jnp.asarray(rng.integers(0, 8160, e2).astype(np.uint32))
    d_f = jnp.asarray(rng.integers(0, 2**32 - 1, e2).astype(np.uint32))
    i_f = jnp.arange(e2, dtype=jnp.uint32)

    def flat_sort(s):
        t2 = t_f + (s * 0).astype(jnp.uint32)
        st, sd, si = lax.sort((t2, d_f, i_f), dimension=0, num_keys=2, is_stable=True)
        return jnp.sum(si[:4].astype(jnp.float32))

    bench("flat sort 13.4M 2key stable", flat_sort)

    # (d) gather 13M x 3 u32 via fancy indexing
    def gather_perm(s):
        a = vals[perm] + (s * 0).astype(jnp.uint32)
        b = t_f[:e][perm]
        c = d_f[:e][perm]
        return jnp.sum((a[:4] + b[:4] + c[:4]).astype(jnp.float32))

    bench("gather 13M x 3 u32", gather_perm)


if __name__ == "__main__":
    main()
