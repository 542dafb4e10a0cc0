"""Pallas segment compactor — piecewise-contiguous runs -> packed layout.

The capped blend path (ops/capped.py) needs each tile's first
min(range, cap) sorted element slots copied into a 128-aligned packed
layout.  The sources are contiguous RUNS (one per tile), so this is not a
random gather: each packed 128-lane chunk maps to one aligned-or-shifted
128-lane window of the source.  XLA's row-gather costs ~6 ns/row regardless
of contiguity (measured, scripts/r2_sortpay_probe.py); this kernel instead
does one 256-lane DMA + one dynamic lane-rotate per 128-lane chunk
(pltpu.roll with a traced shift — probed OK on v5e), which is
bandwidth-bound rather than per-row-bound.

Layout contract (shared with ops/capped.py):
  * per tile t: counts[t] = live slots (<= cap), pcounts[t] = counts rounded
    up to 128, pstart[t] = exclusive cumsum of pcounts;
  * packed chunk j (128 lanes) belongs to exactly one tile (pcounts are
    128-multiples); its first source slot is src0[j];
  * padding lanes (beyond counts within a tile's last chunk, or beyond the
    last tile) carry garbage — callers mask by the packed live mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode

CHUNK = 128
BATCH = 4  # chunks per grid step (one 512-lane output block)


# ---------------------------------------------------------------------------
# Run-granular compactor — one DMA pair per TILE instead of per 128-chunk.
#
# compact_segments above issues one 1 KB DMA per 128-lane output chunk;
# at garden scale (~6M packed slots -> ~49K chunks) that is ~100K DMA issues
# at the measured ~600 ns small-DMA issue cost, i.e. tens of ms of pure
# issue overhead.  The packed layout's runs are PER-TILE (avg cap/128 = 3-8
# chunks long), so issuing one load + one store per tile cuts the issue
# count ~8x.
#
# Alignment: Mosaic requires provably-128-aligned dynamic lane offsets on
# both DMA ends (unaligned offsets fail the server-side compiler: "Failed
# to prove that a tile index ... is divisible by the tiling (128)",
# observed 2026-08-21).  Rather than re-aligning with an in-VMEM roll, the
# packed layout PRESERVES each run's misalignment: tile t's run lands at
# slab_base[t] + (starts[t] mod 128), both DMAs use the aligned-down
# offsets, and the (up to 127) leading lanes of each slab carry source
# garbage that callers mask (the blend's batch in-range masks already
# handle arbitrary range starts).  The whole compactor is then a pure
# aligned DMA pump: no vector ops at all.
#
# A tile's fixed-width (wmax) store overruns its slab into the next tiles'
# region, so stores are strictly serialized — tile t+1's store (issued
# after t's completes) overwrites t's overrun.  Trailing overrun past the
# last tile lands in the wmax-lane output pad and is sliced off.
# ---------------------------------------------------------------------------


def _compact_runs_kernel(
    astarts_ref,  # [T] i32 aligned-down first source slot ((starts//128)*128)
    sbases_ref,   # [T] i32 128-aligned slab base offsets (monotone)
    src_hbm,      # [1, e_pad]
    out_hbm,      # [1, ep + wmax] (ANY; written via explicit DMA)
    buf,          # [2, 1, wmax] VMEM
    load_sem,     # [2]
    store_sem,    # [2]
    *,
    wmax: int,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = lax.rem(t, 2)

    def load(buf_slot, tile):
        a0 = pl.multiple_of(astarts_ref[tile], CHUNK)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(a0, wmax)],
            buf.at[buf_slot],
            load_sem.at[buf_slot],
        )

    def store(buf_slot, tile):
        p0 = pl.multiple_of(sbases_ref[tile], CHUNK)
        return pltpu.make_async_copy(
            buf.at[buf_slot],
            out_hbm.at[:, pl.ds(p0, wmax)],
            store_sem.at[buf_slot],
        )

    @pl.when(t == 0)
    def _():
        load(0, 0).start()

    # Serialize with the t-1 store before reusing its buffer for the t+1
    # load AND before issuing the t store (overlapping destination regions).
    @pl.when(t >= 1)
    def _():
        store(1 - slot, t - 1).wait()

    @pl.when(t + 1 < nt)
    def _():
        load(1 - slot, t + 1).start()

    load(slot, t).wait()
    store(slot, t).start()

    @pl.when(t == nt - 1)
    def _():
        store(slot, t).wait()


@functools.partial(jax.jit, static_argnames=("ep", "wmax"))
def compact_runs(src, starts, sbases, ep: int, wmax: int):
    """Per-run alignment-preserving compaction.

    For every tile t, with off_t = starts[t] mod 128:
      out[sbases[t] + off_t + i] = src[starts[t] + i]
    for i in [0, wmax - 128); equivalently the whole aligned window
    out[sbases[t] : sbases[t]+wmax] = src[align128(starts[t]) : +wmax],
    with later tiles' windows overwriting earlier overrun.

    Args:
      src:    [E] int32/uint32 source values (sorted element order).
      starts: [T] i32 first source slot per tile (range starts, any
              alignment).
      sbases: [T] i32 128-aligned slab bases, monotone non-decreasing,
              with sbases[t+1] - sbases[t] <= wmax.
      ep:     static packed capacity (multiple of 128).
      wmax:   static per-tile DMA window (multiple of 128); each tile's
              slab width (off + count rounded up to 128) must be <= wmax.

    Returns [ep] packed values (dtype of src); lanes outside each tile's
    [sbases+off, sbases+off+count) carry source garbage — callers mask.
    """
    assert ep % CHUNK == 0 and wmax % CHUNK == 0
    e = src.shape[0]
    dtype = src.dtype
    e_pad = -(-e // CHUNK) * CHUNK + wmax
    src_row = jnp.pad(src.astype(jnp.int32), (0, e_pad - e)).reshape(1, e_pad)
    astarts = (starts.astype(jnp.int32) // CHUNK) * CHUNK
    astarts = jnp.clip(astarts, 0, e_pad - wmax)
    sbases = jnp.clip(sbases.astype(jnp.int32), 0, ep)
    nt = starts.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 1, wmax), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_compact_runs_kernel, wmax=wmax),
        out_shape=jax.ShapeDtypeStruct((1, ep + wmax), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(astarts, sbases, src_row)
    return out[0, :ep].astype(dtype)


def _compact_kernel(src0_ref, src_hbm, out_ref, bufs, sems, *, e_pad: int):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = lax.rem(b, 2)
    max_a0 = e_pad - 2 * CHUNK

    def dma(buf_slot, c, j):
        s0 = src0_ref[j]
        a0 = jnp.minimum((s0 // CHUNK) * CHUNK, max_a0)
        a0 = pl.multiple_of(a0, CHUNK)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(a0, 2 * CHUNK)],
            bufs.at[buf_slot, c],
            sems.at[buf_slot, c],
        )

    @pl.when(b == 0)
    def _():
        for c in range(BATCH):
            dma(0, c, c).start()

    @pl.when(b + 1 < nb)
    def _():
        for c in range(BATCH):
            dma(1 - slot, c, (b + 1) * BATCH + c).start()

    parts = []
    for c in range(BATCH):
        j = b * BATCH + c
        dma(slot, c, j).wait()
        s0 = src0_ref[j]
        a0 = jnp.minimum((s0 // CHUNK) * CHUNK, max_a0)
        off = s0 - a0  # in [0, 128) for in-bounds chunks
        off = jnp.clip(off, 0, 2 * CHUNK - 1)
        rolled = pltpu.roll(bufs[slot, c], 2 * CHUNK - off, 1)
        parts.append(rolled[:, 0:CHUNK])
    out_ref[:, :] = jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("ep",))
def compact_segments(src, src0, ep: int):
    """Copy per-chunk 128-lane source windows into a packed [ep] array.

    Args:
      src:  [E] int32/uint32 source values (element order).
      src0: [ep // 128] int32 first source slot of each packed chunk
            (clamped in-bounds by the caller; dead chunks may point
            anywhere valid — their output is masked downstream).
      ep:   static packed capacity, a multiple of 512.

    Returns [ep] packed values (dtype of src).
    """
    assert ep % (BATCH * CHUNK) == 0
    e = src.shape[0]
    dtype = src.dtype
    # Lane-pad the source so aligned 256-lane windows stay in bounds.
    e_pad = -(-e // CHUNK) * CHUNK + 2 * CHUNK
    src_row = jnp.pad(src.astype(jnp.int32), (0, e_pad - e)).reshape(1, e_pad)
    nchunks = ep // CHUNK
    src0 = jnp.clip(src0.astype(jnp.int32), 0, e_pad - 2 * CHUNK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks // BATCH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, BATCH * CHUNK), lambda b, *_: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BATCH, 1, 2 * CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, BATCH)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_compact_kernel, e_pad=e_pad),
        out_shape=jax.ShapeDtypeStruct((1, ep), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(src0, src_row)
    return out.reshape(ep).astype(dtype)
