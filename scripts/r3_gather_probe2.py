"""Why do REAL capped-layout indices gather at 22 ns/row when uniform-random
indices gather at 11.5?  Isolates the pattern dimensions (v5e):

  a. uniform random                      (baseline, ~11.5 ns/row)
  b. random with 8% zeros               (dead-slot masking)
  c. globally sorted                    (probe table says ~31 ns/row)
  d. tile-structured: random values in ~640-slot segments, each value
     repeated in ~2-3 nearby segments   (the real capped layout's shape)
  e. real-ish + remap: d's values XOR-hashed (same repeats/segments,
     decorrelated values)
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

    def g(s, table, idx):
        r = jnp.take(table, idx, axis=0, mode="clip")
        return jnp.sum(r[:8, :]) + s * 0

    idx_a = rng.integers(0, N, EP).astype(np.int32)
    bench("a. uniform random", g, table, jnp.asarray(idx_a))

    idx_b = idx_a.copy()
    idx_b[rng.random(EP) < 0.08] = 0
    bench("b. random + 8% zeros", g, table, jnp.asarray(idx_b))

    idx_c = np.sort(idx_a)
    bench("c. globally sorted", g, table, jnp.asarray(idx_c))

    # d: tile-structured.  ~9800 segments of ~640; values drawn from a pool
    # where each gaussian id appears ~2.4x across adjacent segments.
    seg = 640
    nseg = EP // seg
    per = seg * nseg
    pool = rng.integers(0, N, (nseg, seg)).astype(np.int32)
    dup = rng.random((nseg, seg)) < 0.6
    shifted = np.roll(pool, 1, axis=0)
    pool[dup] = shifted[dup]  # ~60% of values shared with the prior segment
    idx_d = np.concatenate([pool.reshape(-1), idx_a[per:]])
    bench("d. tile-structured (segments + repeats)", g, table,
          jnp.asarray(idx_d))

    idx_e = (idx_d.astype(np.int64) * 2654435761 % N).astype(np.int32)
    bench("e. d hashed (same structure, decorrelated)", g, table,
          jnp.asarray(idx_e))


def main_pressure():
    """Same case-a gather, but with ~3.5 GB of resident HBM allocated first
    (the pass_bench process's live-set) — isolates memory-pressure effects."""
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    ballast = [
        jax.device_put(jnp.zeros((14_190_624,), jnp.uint32))
        for _ in range(24)
    ]  # ~1.4 GB
    ballast.append(jax.device_put(jnp.zeros((5_834_784, 48), jnp.float32)))
    ballast.append(jax.device_put(jnp.zeros((5_834_784, 48), jnp.float32)))
    jax.block_until_ready(ballast[-1])
    table = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, EP).astype(np.int32))

    def g(s, table, idx):
        r = jnp.take(table, idx, axis=0, mode="clip")
        return jnp.sum(r[:8, :]) + s * 0

    bench("a-pressure. uniform random + 3.5 GB ballast", g, table, idx)
    del ballast


if __name__ == "__main__":
    import sys as _sys

    if "--pressure" in _sys.argv:
        main_pressure()
    else:
        main()
