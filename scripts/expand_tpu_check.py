"""TPU validation of the Pallas kernels that client-side lowering cannot
vouch for (CLAUDE.md: server-side Mosaic failures are invisible locally):

1. expansion kernel: bit-parity vs jnp.repeat + timing at bench capacities;
2. run compactor (compact_runs): aligned slab-layout DMA pump with
   serialized overrun stores, bit-parity at bench-like layouts + timing;
3. capped-path smoke: blend_tiles_capped_temporal at small scale, fetched.
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


def parity(n, capacity, seed, cull=0.4, wide=False):
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
        [jnp.asarray(c) for c in cols], jnp.asarray(counts), capacity,
        wide_span=wide,
    )
    got = np.stack([np.asarray(c) for c in got_cols], -1)
    ok = np.array_equal(got[:live], want[:live]) and int(total) == int(counts.sum())
    print(f"parity n={n} cap={capacity} wide={wide}: "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.nonzero((got[:live] != want[:live]).any(-1))[0]
        print("first bad slots:", bad[:10], flush=True)
        print("got ", got[bad[:3]], flush=True)
        print("want", want[bad[:3]], flush=True)
    return ok


def bench(name, n, capacity, mean_count, iters=20, seed=0, wide=False):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(mean_count, size=n).astype(np.int32)
    counts[rng.random(n) < 0.2] = 0
    cols = [jnp.asarray(np.arange(n, dtype=np.int32)) for _ in range(6)]
    cj = jnp.asarray(counts)

    def run(k):
        def body(i, acc):
            out, total = expand_kernel.expand_rows(
                cols[:5] + [cols[5] + i], cj, capacity, wide_span=wide
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


def compact_parity(num_tiles, e, wmax, seed):
    from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import (
        CHUNK,
        compact_runs,
    )

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32)
    counts = rng.integers(0, wmax - CHUNK + 1, num_tiles).astype(np.int32)
    counts[rng.random(num_tiles) < 0.2] = 0
    starts = np.sort(rng.integers(0, e - wmax, num_tiles)).astype(np.int32)
    off = starts % CHUNK
    slabw = -(-(off + counts) // CHUNK) * CHUNK
    sbases = (np.cumsum(slabw) - slabw).astype(np.int32)
    ep = -(-int(slabw.sum()) // 512) * 512 + 512
    got = np.asarray(
        compact_runs(
            jnp.asarray(src), jnp.asarray(starts), jnp.asarray(sbases),
            ep, wmax,
        )
    )
    ok = True
    for s, b, o, c in zip(starts, sbases, off, counts):
        if not np.array_equal(got[b + o : b + o + c], src[s : s + c]):
            ok = False
    print(
        f"compact_runs parity tiles={num_tiles} wmax={wmax}: "
        f"{'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
    return ok


def compact_bench(name, num_tiles, e, cap, wmax, iters=20, seed=0):
    from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import (
        CHUNK,
        compact_runs,
    )

    rng = np.random.default_rng(seed)
    counts = np.full(num_tiles, cap, np.int32)
    starts_np = np.sort(rng.integers(0, e - wmax, num_tiles)).astype(np.int32)
    off = starts_np % CHUNK
    slabw = -(-(off + counts) // CHUNK) * CHUNK
    pstarts = jnp.asarray((np.cumsum(slabw) - slabw).astype(np.int32))
    starts = jnp.asarray(starts_np)
    ep = -(-int(slabw.sum()) // 512) * 512 + 512
    src = jnp.asarray(
        rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32)
    )

    def run(k, s0):
        def body(i, acc):
            out = compact_runs(s0 + i.astype(jnp.uint32), starts, pstarts, ep, wmax)
            return acc + jnp.sum(out[:8].astype(jnp.float32))

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1), src))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); float(f(jnp.int32(1), src)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f(jnp.int32(iters + 1), src)); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms  (tiles={num_tiles}, ep={ep/1e6:.2f}M)",
          flush=True)


def capped_smoke():
    """Tiny end-to-end temporal-capped frame, fetched (server-side Mosaic
    exercise of compact_runs + expansion + flat blend under lax.cond)."""
    import dataclasses

    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.models.gaussians import NUM_SH_COEFFS, GaussianTable
    from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
    from vk3dgaussiansplatting_tpu.ops import keygen, ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
    from vk3dgaussiansplatting_tpu.render.camera import Camera

    config = RenderConfig(
        width=256, height=256, capacity_slack_per_tile=64,
        sort_algorithm=SortAlgorithm.XLA_SORT,
        blend_depth_cap=64, blend_cap_max=256,
    )
    rng = np.random.default_rng(3)
    n = 4000
    table = GaussianTable(
        position=rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        scale=np.full((n, 3), 0.05, np.float32),
        rot=np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        sh=np.concatenate(
            [rng.uniform(0, 1, (n, 1, 3)), np.zeros((n, NUM_SH_COEFFS - 1, 3))],
            axis=1,
        ).astype(np.float32),
        opacity=np.full(n, 0.9, np.float32),
    )
    cam = Camera(config.aspect)
    cam.set_position((0.0, 0.0, 3.0))
    cam.set_rotation(np.pi, 0.0)
    view, proj = cam.matrices()
    tj = jax.tree.map(jnp.asarray, table)
    capacity = config.sort_capacity(n)
    el, fr = keygen.generate_sort_elements(
        tj, jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position),
        config, capacity,
    )
    el = sort_ops.sort_elements(el, config)
    rg = ranges_ops.find_ranges(el, config.num_tiles)
    caps = capped_ops.init_caps(config)
    img, caps, ok = capped_ops.blend_tiles_capped_temporal(
        el, rg, fr, config, caps
    )
    img = np.asarray(img)
    print(
        f"capped smoke: ok={bool(ok)} lit={int((img.sum(-1) > 0).sum())} "
        f"max={float(img.max()):.3f}",
        flush=True,
    )
    return np.isfinite(img).all() and img.max() > 0


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = parity(3000, 8192, 1)
    ok &= parity(5000, 4096, 2, cull=0.9)   # heavy culling, overflow
    ok &= parity(4000, 4096, 3, cull=0.0)   # dense spans
    ok &= parity(3000, 8192, 1, wide=True)
    ok &= parity(5000, 4096, 2, cull=0.9, wide=True)
    ok &= parity(9000, 8192, 4, cull=0.55)  # tail span crossing n_pad - W
    ok &= parity(9000, 8192, 4, cull=0.55, wide=True)
    ok &= compact_parity(64, 300_000, 512 + 128, 7)
    ok &= compact_parity(300, 2_000_000, 4096 + 128, 8)
    ok &= capped_smoke()
    if not ok:
        sys.exit(1)
    # train7k_720p scale: N=559K, capacity ~4.25M, ~3.5M live
    bench("expand train-scale", 559_263, 4_245_463, 6.3)
    # garden30k_1080p scale: N=5.83M, capacity ~14.2M, ~13.1M live
    bench("expand garden-scale", 5_834_784, 14_190_624, 2.25, iters=10)
    # prefilter-thinned steady regime: mean ~1.05 live elements per source
    # row — spans routinely exceed one 512-row chunk (the second pipelined
    # chunk must keep this off the serial refill path, r4)
    bench("expand thinned narrow", 5_834_784, 8_798_720, 1.3, iters=10)
    bench("expand thinned WIDE", 5_834_784, 8_798_720, 1.3, iters=10,
          wide=True)
    bench("expand garden WIDE", 5_834_784, 14_190_624, 2.25, iters=10,
          wide=True)
    # garden-scale compactor: 8160 tiles at the converged mixed-cap regime
    compact_bench("compact_runs garden-scale", 8160, 14_190_624, 512, 4096 + 128)


if __name__ == "__main__":
    main()
