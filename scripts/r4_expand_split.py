"""Decompose the expansion kernel's cost: compare-count vs crossbars vs DMA.

Monkeypatches expand_kernel's internal stages with cheap stand-ins and
times the garden-scale expansion for each variant.  Drives the choice of
the next kernel formulation (pairing crossbars via a shifted-duplicate
table halves crossbar count but not compares; pairing windows halves both
but needs sublane-sliced DMA destinations Mosaic rejects).

Usage: scripts/tpu_run.sh /tmp/expand_split.txt 2400 500 2 -- \
           python -u scripts/r4_expand_split.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel as ek  # noqa

N = 5_834_784
CAP = 14_190_624


def bench(name, counts_j, iters=6):
    def digest(s, ct):
        c0 = jnp.arange(N, dtype=jnp.int32) + s.astype(jnp.int32)
        cols6 = [c0] + [jnp.arange(N, dtype=jnp.int32)] * 5
        cols, total = ek.expand_rows(cols6, ct, CAP)
        return jnp.sum(cols[0][:8].astype(jnp.float32)) + total.astype(
            jnp.float32
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
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms (first {c:.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 5, N).astype(np.int32)
    counts[rng.random(N) < 0.3] = 0
    counts_j = jnp.asarray(counts)

    bench("full kernel", counts_j)

    real_count = ek._count_blocked
    real_gather = ek._gather_groups

    # crossbars replaced by cheap broadcasts (count + DMA remain)
    def fake_gather(vals_buf, local, found, nsrc):
        base = jnp.broadcast_to(local, (ek.NUM_ROWS, ek.WINDOW))
        return base + jnp.broadcast_to(
            found.astype(jnp.int32), (ek.NUM_ROWS, ek.WINDOW)
        ) + vals_buf[:, :1] * 0

    ek._gather_groups = fake_gather
    bench("no-crossbar (count+DMA)", counts_j)
    ek._gather_groups = real_gather

    # compare-count replaced by a cheap synthetic monotone cnt
    def fake_count(vbuf, j_eff, nsrc):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ek.WINDOW), 1)
        covered = nsrc * jnp.int32(ek.GROUP)
        return jnp.minimum(lane // 2, covered - 1) + vbuf[:1, :1] * 0

    ek._count_blocked = fake_count
    bench("no-compare (crossbar+DMA)", counts_j)

    ek._gather_groups = fake_gather
    bench("neither (DMA+loop only)", counts_j)
    ek._count_blocked = real_count
    ek._gather_groups = real_gather


if __name__ == "__main__":
    main()
