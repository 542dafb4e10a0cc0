"""On-device check + timing for the paired-window expansion kernel.

Client-side lowering does not catch server-side Mosaic failures
(CLAUDE.md), so every new kernel formulation must run on the chip once.
Checks bit-parity of expand_rows2 against the round-3 expand_rows on
realistic cull patterns, then times both at train and garden scale.

Usage: scripts/tpu_run.sh /tmp/expand2.txt 2400 500 2 -- \
           python -u scripts/expand2_tpu_check.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import expand2_kernel  # noqa: E402
from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel  # noqa: E402


def parity(n, capacity, seed, p_cull=0.35, hi=5):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, hi, n).astype(np.int32)
    counts[rng.random(n) < p_cull] = 0
    cols = [
        np.arange(n, dtype=np.int32),
        rng.integers(-(2**31), 2**31, n).astype(np.int32),
        rng.integers(-(2**31), 2**31, n).astype(np.int32),
    ]
    cj = [jnp.asarray(c) for c in cols]
    counts_j = jnp.asarray(counts)
    got, got_cum, total = jax.jit(
        lambda c0, c1, c2, ct: expand2_kernel.expand_rows2(
            [c0, c1, c2], ct, capacity
        )
    )(*cj, counts_j)
    want, want_total = jax.jit(
        lambda c0, c1, c2, ct: expand_kernel.expand_rows(
            [c0, c1, c2], ct, capacity
        )
    )(*cj, counts_j)
    live = int(min(counts.sum(), capacity))
    assert int(total) == int(want_total), (int(total), int(want_total))
    for i in range(3):
        a = np.asarray(got[i])[:live]
        b = np.asarray(want[i])[:live]
        bad = np.nonzero(a != b)[0]
        assert bad.size == 0, (
            f"col {i}: {bad.size} mismatches, first at {bad[:5]}"
        )
    # gathered cumsum column parity vs numpy
    cum = np.cumsum(counts).astype(np.int32)
    want_cum = np.repeat(cum, counts)[:live]
    np.testing.assert_array_equal(np.asarray(got_cum)[:live], want_cum)
    print(f"parity OK n={n} capacity={capacity} live={live}", flush=True)


def bench(name, n, capacity, mean_count, iters=8):
    rng = np.random.default_rng(3)
    counts = rng.integers(
        0, int(mean_count * 2) + 1, n
    ).astype(np.int32)
    counts[rng.random(n) < 0.3] = 0
    counts_j = jnp.asarray(counts)

    for tag, mod, unpack in (
        ("expand2", expand2_kernel, True),
        ("expand1", expand_kernel, False),
    ):
        def digest(s, ct, mod=mod, unpack=unpack):
            c0 = jnp.arange(n, dtype=jnp.int32) + s.astype(jnp.int32)
            cols_in = [c0, jnp.arange(n, dtype=jnp.int32),
                       jnp.arange(n, dtype=jnp.int32)]
            if unpack:
                cols, cum_col, total = mod.expand_rows2(
                    cols_in, ct, capacity
                )
                extra = jnp.sum(cum_col[:8].astype(jnp.float32))
            else:
                cols, total = mod.expand_rows(cols_in, ct, capacity)
                extra = 0.0
            return (
                jnp.sum(cols[0][:8].astype(jnp.float32))
                + total.astype(jnp.float32)
                + extra
            )

        f = jax.jit(digest)

        def run(k):
            d = None
            for i in range(k):
                d = f(jnp.float32(i), counts_j)
            return float(d)

        t0 = time.perf_counter()
        run(1)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(iters + 1)
        tn = time.perf_counter() - t0
        print(
            f"{name} {tag}: {(tn-t1)/iters*1e3:.2f} ms (first {c:.1f}s)",
            flush=True,
        )


def main():
    parity(40_000, 120_000, seed=1)
    parity(40_000, 30_000, seed=2)  # overflow truncation
    parity(200_000, 1_000, seed=3, p_cull=0.9)  # long culled runs
    bench("train-scale", 559_263, 4_245_463, 6.3)
    bench("garden-scale", 5_834_784, 14_190_624, 2.25)
    bench("garden-steady", 5_834_784, 8_798_720, 1.5)


if __name__ == "__main__":
    main()
