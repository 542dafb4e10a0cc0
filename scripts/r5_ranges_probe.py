"""find_ranges steady-shape regression probe (r5): 1.03 ms at 14.19M but
5.7 ms at 8.80M on the current server stack — sweep the two-level search
CHUNK and a 3-level coarse to see whether the [nc, P] coarse compare is the
term that stopped fusing.

Usage: scripts/tpu_run.sh /tmp/rng.txt 2400 500 2 -- python -u scripts/r5_ranges_probe.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops.keygen import SortElements

T = 8160


def bench(name, f, *xargs, iters=16):
    """In-jit fori protocol (CLAUDE.md): the dispatch-loop + fetch timing
    is unreliable over the tunnel (r5 gather-probe lesson)."""
    from jax import lax

    def run(k, *a):
        def body(i, acc):
            return acc * jnp.float32(1e-30) + f(i.astype(jnp.uint32), *a)

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    g = jax.jit(run)
    t0 = time.perf_counter(); float(g(jnp.int32(1), *xargs))
    c = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(1), *xargs))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(iters + 1), *xargs))
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / iters * 1e3:.2f} ms (first {c:.1f}s)",
          flush=True)


def make_elements(e, live, seed=3):
    rng = np.random.default_rng(seed)
    tiles = np.sort(rng.integers(0, T, live).astype(np.uint32))
    full = np.full(e, 0xFFFFFFFF, np.uint32)
    full[:live] = tiles
    return SortElements(
        tile=jnp.asarray(full),
        depth=jnp.zeros(e, jnp.uint32),
        index=jnp.zeros(e, jnp.uint32),
        count=jnp.uint32(live),
    )


def fr(s, el):
    el2 = SortElements(
        tile=el.tile | (s >> jnp.uint32(31)), depth=el.depth, index=el.index,
        count=el.count,
    )
    r = ranges_ops.find_ranges(el2, T)
    return jnp.sum(r[:, 1].astype(jnp.float32))


def search3(arr, probes, c1=1024, c2=64):
    """3-level left search: chunk-of-chunk coarse, then chunk, then fine."""
    e = arr.shape[0]
    nc = -(-e // c1)
    pad = nc * c1 - e
    maxval = jnp.asarray(jnp.iinfo(arr.dtype).max, arr.dtype)
    arr_pad = jnp.concatenate([arr, jnp.full((pad,), maxval, arr.dtype)])
    mat = arr_pad.reshape(nc, c1)
    lasts = mat[:, -1]
    nc2 = -(-nc // c2)
    pad2 = nc2 * c2 - nc
    lasts_pad = jnp.concatenate([lasts, jnp.full((pad2,), maxval, arr.dtype)])
    mat2 = lasts_pad.reshape(nc2, c2)
    lasts2 = mat2[:, -1]
    # level-0: which super-chunk
    s0 = jnp.sum((lasts2[:, None] < probes[None, :]).astype(jnp.int32), axis=0)
    rows2 = jnp.take(mat2, jnp.minimum(s0, nc2 - 1), axis=0)  # [P, c2]
    w2 = jnp.sum((rows2 < probes[:, None]).astype(jnp.int32), axis=1)
    cstar = jnp.minimum(s0 * c2 + jnp.where(s0 >= nc2, 0, w2), nc)
    rows = jnp.take(mat, jnp.minimum(cstar, nc - 1), axis=0)
    within = jnp.sum((rows < probes[:, None]).astype(jnp.int32), axis=1)
    pos = cstar * c1 + jnp.where(cstar >= nc, 0, within)
    return jnp.minimum(pos, e).astype(jnp.int32)


def fr3(s, el):
    tile = el.tile | (s >> jnp.uint32(31))
    probes = jnp.arange(T + 1, dtype=jnp.uint32)
    ext = search3(tile, probes)
    return jnp.sum(ext.astype(jnp.float32))


from vk3dgaussiansplatting_tpu.ops import search as search_mod

for e, live in ((8_800_128, 6_100_000), (14_190_624, 13_070_000)):
    el = make_elements(e, live)
    bench(f"find_ranges e={e/1e6:.2f}M (CHUNK=1024)", jax.jit(fr), el)
    bench(f"search3 raw e={e/1e6:.2f}M (1024x64)", jax.jit(fr3), el)
    for ch in (2048, 4096):
        search_mod.CHUNK = ch
        bench(f"find_ranges e={e/1e6:.2f}M (CHUNK={ch})", jax.jit(fr), el)
    search_mod.CHUNK = 1024
    del el
