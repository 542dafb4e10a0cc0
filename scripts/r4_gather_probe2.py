"""Gather anomaly, round 2: Pallas-kernel pollution + width/row-count sweep.

r4_gather_probe found NO slowdown from allocs, ballast, sorts, compiles, or
re-transfers — the fresh-process two-gather program runs 75 ms, matching the
round-3 "fresh" number, while the real pipeline pays ~140 ms.  The one
thing the pipeline process does that the probe did not: execute Pallas
kernels (expansion, run compaction, flat blend).  This probe times the
identical gather program before and after running each Pallas kernel at
garden shapes, plus a width/row-count sweep to anchor the gather cost
model (per-row vs per-byte).

Usage: scripts/tpu_run.sh /tmp/r4_gather2.txt 3600 700 2 -- \
           python -u scripts/r4_gather_probe2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

E = 6_270_464  # packed-slot count (128-multiple)
N = 5_834_784


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


def g2_two(s, ta, tb, idx):
    ra = jnp.take(ta, idx, axis=0, mode="clip")
    rb = jnp.take(tb, idx, axis=0, mode="clip")
    return jnp.sum(ra[:8, :]) + jnp.sum(rb[:8, :]) + s * 0


def main():
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    ta = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    tb = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    g2 = jax.jit(g2_two)

    print("== width / row-count anchors ==", flush=True)
    bench("two w4 gathers 6.27M (baseline)", g2, ta, tb, idx)

    def g1(s, t, idx):
        return jnp.sum(jnp.take(t, idx, axis=0, mode="clip")[:8, :]) + s * 0

    t8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    bench("one w8 gather 6.27M", jax.jit(g1), t8, idx)
    del t8
    t2 = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
    bench("one w2 gather 6.27M", jax.jit(g1), t2, idx)
    del t2
    for rows in (3_145_728, 4_587_520):
        idx_r = jnp.asarray(rng.integers(0, N, rows).astype(np.int32))
        bench(f"two w4 gathers {rows/1e6:.2f}M rows", g2, ta, tb, idx_r)
        del idx_r

    print("== pallas pollution ==", flush=True)
    from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import (
        compact_runs,
    )
    from vk3dgaussiansplatting_tpu.ops.pallas.expand_kernel import expand_rows

    CAP = 14_190_624
    T = 8160

    # 1) expansion kernel at garden shape
    counts = jnp.asarray(
        rng.integers(0, 5, N).astype(np.int32)
    )

    def exp_digest(s, counts):
        c0 = jnp.arange(N, dtype=jnp.int32) + s.astype(jnp.int32)
        cols6 = [c0] + [jnp.arange(N, dtype=jnp.int32)] * 5
        cols, total = expand_rows(cols6, counts, CAP)
        return jnp.sum(cols[0][:8].astype(jnp.float32)) + total.astype(
            jnp.float32
        )

    bench("expand_rows 14.19M", jax.jit(exp_digest), counts, iters=2)
    bench("two w4 gathers AFTER expand", g2, ta, tb, idx)

    # 2) run compactor at garden shape
    src = jnp.asarray(rng.integers(0, N, CAP).astype(np.uint32))
    starts_np = np.sort(rng.integers(0, CAP - 5000, T)).astype(np.int32)
    counts_t = np.minimum(
        rng.integers(0, 512, T), 4096
    ).astype(np.int32)
    off = starts_np % 128
    slabw = -(-(off + counts_t) // 128) * 128
    pcum = np.cumsum(slabw)
    sbase = (pcum - slabw).astype(np.int32)
    wmax = 4096 + 128
    starts_j = jnp.asarray(starts_np)
    sbase_j = jnp.asarray(sbase)

    def cr_digest(s, src, st, sb):
        out = compact_runs(src + s.astype(jnp.uint32), st, sb, E, wmax)
        return jnp.sum(out[:8].astype(jnp.float32))

    bench("compact_runs", jax.jit(cr_digest), src, starts_j, sbase_j,
          iters=3)
    bench("two w4 gathers AFTER compact", g2, ta, tb, idx)

    # 3) flat blend kernel at garden shape
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel

    config = RenderConfig(width=1920, height=1080, capacity_pow_two=False)
    feat = jnp.asarray(
        rng.normal(size=(blend_kernel.NUM_FEATURES, E + 1024)).astype(
            np.float32
        )
    )
    pr = np.zeros((T, 2), np.uint32)
    pr[:, 0] = sbase + off
    pr[:, 1] = pr[:, 0] + np.minimum(counts_t, 512)
    pr_j = jnp.asarray(pr)

    def bl_digest(s, feat, pr):
        img, t = blend_kernel.blend_flat_core(
            feat + s * jnp.float32(1e-9), pr, config, E, with_t=True
        )
        return jnp.sum(img[::97, ::97, 0]) + jnp.sum(t[::97, ::97])

    bench("blend_flat_core", jax.jit(bl_digest), feat, pr_j, iters=3)
    bench("two w4 gathers AFTER blend", g2, ta, tb, idx)

    # 4) all three in-flight interleaved with the gather (the real frame)
    def frame_like(s):
        d1 = cr_digest(s, src, starts_j, sbase_j)
        d2 = g2(s, ta, tb, idx)
        d3 = bl_digest(s, feat, pr_j)
        return d1 + d2 + d3

    f_cr = jax.jit(cr_digest)
    f_bl = jax.jit(bl_digest)

    def inter_digest(s):
        d1 = f_cr(s, src, starts_j, sbase_j)
        d2 = g2(s, ta, tb, idx)
        d3 = f_bl(s, feat, pr_j)
        return d1 + d2 + d3

    def run(n):
        d = None
        for i in range(n):
            d = inter_digest(jnp.float32(i) * jnp.float32(1e-6))
        return float(d)

    t0 = time.perf_counter()
    run(1)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(7)
    tn = time.perf_counter() - t0
    print(
        f"interleaved compact+gather+blend: {(tn-t1)/6*1e3:.2f} ms "
        f"(compact+blend alone would predict the delta)",
        flush=True,
    )
    bench("two w4 gathers AFTER interleaved", g2, ta, tb, idx)


if __name__ == "__main__":
    main()
