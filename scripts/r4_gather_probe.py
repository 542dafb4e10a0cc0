"""Round-4 gather probes: table-size curve + the 2x process-state anomaly.

The round-3 finding (CLAUDE.md): the SAME cached gather executable runs the
dominant split gathers ~2x slower inside the frame pipeline's process than
in a fresh process (140 vs 72 ms); index values/order, operand provenance,
optimization barriers, and HBM ballast were ruled out.  This probe tries to
REPRODUCE the slowdown minimally by polluting a fresh process step by step
(big compiles, a garden-scale sort, large transient allocations) and
re-timing the identical gather executable + arrays after each step, plus a
table-row-count curve (does a compacted feature table gather faster?).

Usage: scripts/tpu_run.sh /tmp/r4_gather.txt 2400 500 2 -- \
           python -u scripts/r4_gather_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

E = 6_270_000  # packed-slot count (garden steady state)
N = 5_834_784  # gaussian-table rows


def bench(name, f, *xargs, iters=6):
    def run(n):
        d = None
        for i in range(n):
            d = f(jnp.float32(i) * jnp.float32(1e-6), *xargs)
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
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms  (first {c:.1f}s)", flush=True)
    return dt


def g4_digest(s, t4, idx):
    rows = jnp.take(t4, idx, axis=0, mode="clip")
    return jnp.sum(rows[:8, :]) + s * 0


def main():
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    g = jax.jit(g4_digest)

    print("== fresh-process baseline ==", flush=True)
    bench("gather [5.8M,4] x 6.27M fresh", g, table, idx)

    print("== table-size curve (same idx count) ==", flush=True)
    for rows in (65_536, 524_288, 1_048_576, 2_097_152, 4_194_304):
        t_small = jnp.asarray(
            rng.normal(size=(rows, 4)).astype(np.float32)
        )
        idx_small = jnp.asarray(rng.integers(0, rows, E).astype(np.int32))
        bench(f"gather [{rows/1e6:.2f}M,4] x 6.27M", g, t_small, idx_small)
        del t_small, idx_small

    print("== pollution steps (same executable + arrays) ==", flush=True)
    # step 1: big transient allocations (alloc + free 4 GB)
    for _ in range(4):
        big = jnp.zeros((256, 1024, 1024), jnp.float32)  # 1 GB
        big = (big + 1.0).block_until_ready()
        del big
    bench("gather after 4x1GB alloc/free", g, table, idx)

    # step 2: live ballast resident during the gather
    ballast = [jnp.ones((256, 1024, 1024), jnp.float32) for _ in range(2)]
    [b.block_until_ready() for b in ballast]
    bench("gather with 2GB live ballast", g, table, idx)
    del ballast
    bench("gather after ballast freed", g, table, idx)

    # step 3: run a garden-scale 3-key sort a few times
    CAP = 14_190_624
    tiles = jnp.asarray(
        rng.integers(0, 8160, CAP).astype(np.uint16)
    )
    depth = jnp.asarray(rng.integers(0, 2**32 - 1, CAP).astype(np.uint32))
    gid = jnp.asarray(rng.integers(0, N, CAP).astype(np.uint32))

    def sort_digest(s, t, d, i):
        t2, d2, i2 = jax.lax.sort(
            (t, d + s.astype(jnp.uint32), i),
            dimension=0, num_keys=3, is_stable=False,
        )
        return jnp.sum(i2[:8].astype(jnp.float32))

    bench("14.19M 3-key sort", jax.jit(sort_digest), tiles, depth, gid,
          iters=2)
    bench("gather after sort ran", g, table, idx)

    # step 4: re-materialize the gather operands (fresh host transfer)
    table2 = jnp.asarray(np.asarray(table))
    idx2 = jnp.asarray(np.asarray(idx))
    bench("gather on re-transferred operands", g, table2, idx2)

    # step 5: many executables loaded (compile a dozen trivial programs)
    for k in range(12):
        f = jax.jit(lambda x, k=k: jnp.sum(x * (k + 2)))
        float(f(jnp.ones((1024, 1024), jnp.float32)))
    bench("gather after 12 extra compiles", g, table, idx)

    # step 6: gather as a NON-first op in its program (in-graph neighbor op)
    def g4_busy(s, t4, idx):
        t4b = t4 + s  # forces a fresh in-graph operand buffer
        rows = jnp.take(t4b, idx, axis=0, mode="clip")
        return jnp.sum(rows[:8, :])

    bench("gather with in-graph operand (+s)", jax.jit(g4_busy), table, idx)

    # step 7: two gathers in one program (the real pipeline shape)
    def g4_two(s, ta, tb, idx):
        ra = jnp.take(ta, idx, axis=0, mode="clip")
        rb = jnp.take(tb, idx, axis=0, mode="clip")
        return jnp.sum(ra[:8, :]) + jnp.sum(rb[:8, :]) + s * 0

    tb2 = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    bench("two gathers, one program", jax.jit(g4_two), table, tb2, idx)


if __name__ == "__main__":
    main()
