"""TPU validation of the Pallas expansion kernel: lowering, parity, speed.

1. bit-parity vs jnp.repeat at small scale (fetches both results);
2. timing at train7k/garden30k capacity with the in-jit fori protocol.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel


def parity(n, capacity, seed, cull=0.4):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 9, size=n).astype(np.int32)
    counts[rng.random(n) < cull] = 0
    depth = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    cols = [
        np.arange(n, dtype=np.int32),
        (np.cumsum(counts) - counts).astype(np.int32),
        depth.view(np.int32),
    ]
    want = np.repeat(np.stack(cols, -1), counts, axis=0)
    live = min(want.shape[0], capacity)

    got_cols, total = expand_kernel.expand_rows(
        [jnp.asarray(c) for c in cols], jnp.asarray(counts), capacity
    )
    got = np.stack([np.asarray(c) for c in got_cols], -1)
    ok = np.array_equal(got[:live], want[:live]) and int(total) == int(counts.sum())
    print(f"parity n={n} cap={capacity}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.nonzero((got[:live] != want[:live]).any(-1))[0]
        print("first bad slots:", bad[:10], flush=True)
        print("got ", got[bad[:3]], flush=True)
        print("want", want[bad[:3]], flush=True)
    return ok


def bench(name, n, capacity, mean_count, iters=20, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(mean_count, size=n).astype(np.int32)
    counts[rng.random(n) < 0.2] = 0
    cols = [jnp.asarray(np.arange(n, dtype=np.int32)) for _ in range(6)]
    cj = jnp.asarray(counts)

    def run(k):
        def body(i, acc):
            out, total = expand_kernel.expand_rows(
                cols[:5] + [cols[5] + i], cj, capacity
            )
            return acc * jnp.float32(1e-30) + jnp.sum(
                out[0][:8].astype(jnp.float32)
            ) + total.astype(jnp.float32)

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); float(f(jnp.int32(1))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(jnp.int32(iters + 1))); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms  (n={n}, cap={capacity}, live~{counts.sum()/1e6:.2f}M)",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = parity(3000, 8192, 1)
    ok &= parity(5000, 4096, 2, cull=0.9)   # heavy culling, overflow
    ok &= parity(4000, 4096, 3, cull=0.0)   # dense spans
    if not ok:
        sys.exit(1)
    # train7k_720p scale: N=559K, capacity ~4.25M, ~3.5M live
    bench("expand train-scale", 559_263, 4_245_463, 6.3)
    # garden30k_1080p scale: N=5.83M, capacity ~14.2M, ~13.1M live
    bench("expand garden-scale", 5_834_784, 14_190_624, 2.25, iters=10)


if __name__ == "__main__":
    main()
