"""Retest the W=1024 expansion window on the CURRENT server stack (r5).

r4 found 512/1024/2048 full-kernel = 30.0/25.7/32.3 ms but W=1024
MISCOMPILED server-side (refill lanes zero; interpret exact) and parked the
win "on a newer libtpu".  This round's server compiles ~5x faster (new
stack), so re-run bit-parity + timing at W=1024 before re-parking.

Usage: scripts/tpu_run.sh /tmp/exp1024.txt 3000 600 2 -- python -u scripts/r5_expand_w1024.py
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

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel as ek


def set_window(w):
    ek.WINDOW = w
    ek.NBLOCKS = w // ek.GROUP
    ek.MAX_NSRC = 2 * ek.NBLOCKS
    # fresh jit cache: expand_rows is wrapped in functools.partial(jax.jit);
    # re-wrap so the new globals are traced
    import functools

    ek.expand_rows = functools.partial(
        jax.jit, static_argnames=("capacity", "wide_span")
    )(ek.expand_rows.__wrapped__)


def parity(n, capacity, seed, mean_count=2.0, cull=0.3, wide=False,
           long_runs=False):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(mean_count, size=n).astype(np.int32)
    counts[rng.random(n) < cull] = 0
    if long_runs:
        # adversarial: a few gaussians with huge counts (span >> chunks)
        idx = rng.integers(0, n, 50)
        counts[idx] = rng.integers(2000, 9000, 50).astype(np.int32)
    depth = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    cols = [
        np.arange(n, dtype=np.int32),
        (np.cumsum(counts) - counts).astype(np.int32),
        depth.view(np.int32),
    ]
    want = np.repeat(np.stack(cols, -1), counts, axis=0)
    live = min(want.shape[0], capacity)
    got_cols, total = ek.expand_rows(
        [jnp.asarray(c) for c in cols], jnp.asarray(counts), capacity,
        wide_span=wide,
    )
    got = np.stack([np.asarray(c) for c in got_cols], -1)
    ok = np.array_equal(got[:live], want[:live]) and int(total) == int(
        counts.sum()
    )
    print(
        f"parity W={ek.WINDOW} n={n} cap={capacity} wide={wide} "
        f"long={long_runs}: {'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
    if not ok:
        bad = np.nonzero((got[:live] != want[:live]).any(-1))[0]
        print("first bad slots:", bad[:10], flush=True)
    return ok


def bench(name, n, capacity, mean_count, iters=20, seed=0, wide=False):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(mean_count, size=n).astype(np.int32)
    counts[rng.random(n) < 0.2] = 0
    cols = [jnp.asarray(np.arange(n, dtype=np.int32)) for _ in range(6)]
    cj = jnp.asarray(counts)

    def run(k):
        def body(i, acc):
            out, total = ek.expand_rows(
                cols[:5] + [cols[5] + i], cj, capacity, wide_span=wide
            )
            return acc * jnp.float32(1e-30) + jnp.sum(
                out[0][:8].astype(jnp.float32)
            ) + total.astype(jnp.float32)

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter(); float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(
        f"{name}: {dt*1e3:.2f} ms  (n={n}, cap={capacity}, "
        f"live~{counts.sum()/1e6:.2f}M)",
        flush=True,
    )


N = 5_834_784
# small parity first (fast fail), then garden shapes, then timing
for w in (1024,):
    set_window(w)
    ok = True
    ok &= parity(200_000, 300_000, seed=1, mean_count=1.5)
    ok &= parity(200_000, 300_000, seed=2, mean_count=1.0, wide=True)
    ok &= parity(200_000, 500_000, seed=3, mean_count=2.0, long_runs=True)
    ok &= parity(200_000, 500_000, seed=4, mean_count=1.0, wide=True,
                 long_runs=True)
    if not ok:
        print(f"W={w}: STILL MISCOMPILES — keep 512", flush=True)
        break
    ok &= parity(N, 8_800_128, seed=5, mean_count=1.05, cull=0.35, wide=True)
    ok &= parity(N, 14_190_624, seed=6, mean_count=2.3, cull=0.3)
    if not ok:
        print(f"W={w}: large-shape MISMATCH — keep 512", flush=True)
        break
    bench(f"W={w} full-capacity (14.19M)", N, 14_190_624, 2.3)
    bench(f"W={w} steady thinned wide (8.80M)", N, 8_800_128, 1.05,
          wide=True)
    bench(f"W={w} steady thinned narrow (8.80M)", N, 8_800_128, 1.05)

set_window(512)
bench("W=512 full-capacity (14.19M) [control]", N, 14_190_624, 2.3)
bench("W=512 steady thinned wide (8.80M) [control]", N, 8_800_128, 1.05,
      wide=True)
