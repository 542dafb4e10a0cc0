"""Round-2 hardware probes for the tile-partition (radix replacement) design.

Decisions these numbers drive (see VERDICT r1 item 3):
  P1: dynamic-offset DMA issue cost (HBM->VMEM and VMEM->HBM, several
      sizes) — bounds the run-granularity scatter's viable run size;
  P2: 128-lane crossbar (`take_along_axis`) throughput — bounds the
      in-VMEM local reorder;
  P3: dynamic SUBLANE-offset DMA legality/cost — decides element-major
      [E, 16] layouts;
  P4: lax.sort (u32 key, u32 payload) at N=5.8M — the depth pre-sort;
  P5: one [N] -> [E] monotone row gather at garden scale via the expand
      kernel — the expansion's share of the rebuilt pipeline.

Run: scripts/tpu_run.sh /tmp/dma_probe.txt 3600 600 2 -- \\
         python -u scripts/r2_dma_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def bench(name, fn, *args, iters=8):
    """In-jit fori timing (CLAUDE.md protocol)."""

    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + fn(*args, i)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.time()
    try:
        float(f(jnp.int32(1)))
    except Exception as e:  # noqa: BLE001 — probes must report, not die
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return dt


# --- P1: dynamic-offset DMA issue cost ------------------------------------


def dma_kernel(offs_ref, src_hbm, out_ref, buf, sem, *, k, rows, width):
    """Double-buffered: DMA i+1 is in flight while i is consumed, so the
    loop measures sustained issue+transfer cost, not per-DMA latency."""
    acc = jnp.zeros((rows, width), jnp.float32)

    def dma(slot, i):
        o = offs_ref[i]
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(pl.multiple_of(o, 128), width)],
            buf.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < k)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        return acc + buf[slot]

    acc = lax.fori_loop(0, k, body, acc)
    out_ref[:, :] = acc


def probe_dma_load(n_dmas, rows, width, e=4_000_000):
    src = jnp.ones((rows, e), jnp.float32)
    offs = (np.random.default_rng(0).integers(0, (e - width) // 128, n_dmas) * 128
            ).astype(np.int32)
    offs = jnp.asarray(offs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(dma_kernel, k=n_dmas, rows=rows, width=width),
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.float32),
        grid_spec=grid_spec,
    )

    def fn(offs, src, i):
        return call(offs + (i % 2), src)[0, 0]  # offs vary to defeat caching

    dt = bench(f"P1 load {n_dmas}x[{rows},{width}]", fn, offs, src)
    if dt:
        per = dt / n_dmas
        by = rows * width * 4
        print(f"    -> {per*1e9:.0f} ns/DMA, {by/per/1e9:.1f} GB/s effective",
              flush=True)


# --- P2: crossbar throughput ----------------------------------------------


def xbar_kernel(x_ref, idx_ref, out_ref, *, m):
    acc = jnp.zeros((8, 128), jnp.int32)
    idx = idx_ref[:, :]

    def body(i, acc):
        g = jnp.take_along_axis(x_ref[:, :] + i, idx, axis=1)
        return acc + g

    acc = lax.fori_loop(0, m, body, acc)
    out_ref[:, :] = acc


def probe_xbar(m=100_000):
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, 128, (8, 128)).astype(np.int32)
    )
    call = pl.pallas_call(
        functools.partial(xbar_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def fn(x, idx, i):
        return call(x + (i % 2), idx)[0, 0].astype(jnp.float32)

    dt = bench(f"P2 crossbar x{m}", fn, x, idx)
    if dt:
        print(f"    -> {dt/m*1e9:.1f} ns per [8,128] crossbar", flush=True)


# --- P3: dynamic sublane-offset DMA ---------------------------------------


def store_kernel(offs_ref, src_vmem, out_hbm, sem, *, k, rows, width):
    """Dynamic-offset VMEM->HBM stores (the scatter's write side)."""

    def dma(slot, i):
        o = offs_ref[i]
        return pltpu.make_async_copy(
            src_vmem.at[:, pl.ds(0, width)],
            out_hbm.at[:, pl.ds(pl.multiple_of(o, 128), width)],
            sem.at[slot],
        )

    dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < k)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        return 0

    lax.fori_loop(0, k, body, 0)


def probe_dma_store(n_dmas, rows, width, e=4_000_000):
    src = jnp.ones((rows, width), jnp.float32)
    offs = (np.random.default_rng(5).integers(0, (e - width) // 128, n_dmas) * 128
            ).astype(np.int32)
    offs = jnp.asarray(offs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    call = pl.pallas_call(
        functools.partial(store_kernel, k=n_dmas, rows=rows, width=width),
        out_shape=jax.ShapeDtypeStruct((rows, e), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def fn(offs, src, i):
        out = call(offs + (i % 2), src + i.astype(jnp.float32))
        return out[0, 0]

    dt = bench(f"P1s store {n_dmas}x[{rows},{width}]", fn, offs, src)
    if dt:
        per = dt / n_dmas
        by = rows * width * 4
        print(f"    -> {per*1e9:.0f} ns/DMA, {by/per/1e9:.1f} GB/s effective",
              flush=True)


def sublane_kernel(offs_ref, src_hbm, out_ref, buf, sem, *, k, rows, width):
    def dma(slot, i):
        o = offs_ref[i]
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(o, rows), :],
            buf.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()
    acc = jnp.zeros((rows, width), jnp.float32)

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < k)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        return acc + buf[slot]

    acc = lax.fori_loop(0, k, body, acc)
    out_ref[:, :] = acc


def probe_sublane_dma(n_dmas=2048, rows=64, width=16, e=4_000_000):
    src = jnp.ones((e, width), jnp.float32)
    offs = jnp.asarray(
        np.random.default_rng(2).integers(0, e - rows, n_dmas).astype(np.int32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(sublane_kernel, k=n_dmas, rows=rows, width=width),
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.float32),
        grid_spec=grid_spec,
    )

    def fn(offs, src, i):
        return call(offs + (i % 2), src)[0, 0]

    dt = bench(f"P3 sublane-dyn load {n_dmas}x[{rows},{width}]", fn, offs, src)
    if dt:
        print(f"    -> {dt/n_dmas*1e9:.0f} ns/DMA", flush=True)


# --- P4: depth pre-sort at N ----------------------------------------------


def probe_depth_sort(n=5_834_784):
    key = jnp.asarray(
        np.random.default_rng(3).integers(0, 2**32, n, dtype=np.uint64
                                          ).astype(np.uint32)
    )
    payload = jnp.arange(n, dtype=jnp.uint32)

    def fn(key, payload, i):
        k, p = lax.sort((key + i.astype(jnp.uint32), payload), dimension=0,
                        num_keys=1, is_stable=True)
        return k[0].astype(jnp.float32) + p[-1].astype(jnp.float32)

    bench(f"P4 lax.sort u32+u32 @{n/1e6:.1f}M", fn, key, payload)


def probe_wide_sort(n=5_834_784, cols=8):
    key = jnp.asarray(
        np.random.default_rng(4).integers(0, 2**32, n, dtype=np.uint64
                                          ).astype(np.uint32)
    )
    pay = [jnp.arange(n, dtype=jnp.uint32) + c for c in range(cols)]

    def fn(key, i):
        outs = lax.sort((key + i.astype(jnp.uint32), *pay), dimension=0,
                        num_keys=1, is_stable=True)
        return outs[0][0].astype(jnp.float32) + outs[-1][-1].astype(jnp.float32)

    bench(f"P4b lax.sort u32+{cols}xu32 @{n/1e6:.1f}M", fn, key)


# --- P6/P7: XLA row-gather cost structure ---------------------------------


def probe_row_gather(e=4_194_304, n=4_000_000, width=16, sorted_idx=False,
                     name=""):
    """ns/row of jnp.take rows [N,width] -> [E,width]; the capped-gather
    design hinges on whether piecewise-sorted indices beat random ones."""
    table = jnp.ones((n, width), jnp.float32)
    rng = np.random.default_rng(6)
    idx = rng.integers(0, n, e).astype(np.int32)
    if sorted_idx:
        idx = np.sort(idx)
    idx = jnp.asarray(idx)

    def fn(table, idx, i):
        rows = jnp.take(table, idx + (i % 2), axis=0,
                        indices_are_sorted=sorted_idx, mode="clip")
        return rows[0, 0] + rows[-1, -1]

    dt = bench(f"P6 gather [{n/1e6:.1f}M,{width}] x {e/1e6:.1f}M "
               f"{'sorted' if sorted_idx else 'random'}{name}", fn, table, idx,
               iters=4)
    if dt:
        print(f"    -> {dt/e*1e9:.2f} ns/row", flush=True)


def probe_roll_dynamic():
    """pltpu.roll with a traced shift — the segment compactor's align trick."""

    def k(s_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], s_ref[0], 1)

    x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    s = jnp.asarray([37], jnp.int32)
    try:
        call = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(call)(s, x))
        want = np.roll(np.asarray(x), 37, axis=1)
        print(f"P8 dynamic roll: OK correct={np.array_equal(got, want)}",
              flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"P8 dynamic roll: FAIL {type(ex).__name__}: {str(ex)[:160]}",
              flush=True)


def main():
    print(f"probes on {jax.devices()[0].platform}", flush=True)
    probe_dma_load(2048, 16, 128)
    probe_dma_load(2048, 16, 512)
    probe_dma_load(512, 16, 2048)
    probe_dma_store(2048, 16, 128)
    probe_dma_store(2048, 16, 512)
    probe_xbar()
    probe_sublane_dma()
    probe_roll_dynamic()
    probe_row_gather(sorted_idx=False)
    probe_row_gather(sorted_idx=True)
    probe_row_gather(n=65_536, name=" smalltable")
    probe_row_gather(width=4, name=" narrow")
    probe_depth_sort()
    probe_wide_sort()
    print("probes done", flush=True)


if __name__ == "__main__":
    main()
