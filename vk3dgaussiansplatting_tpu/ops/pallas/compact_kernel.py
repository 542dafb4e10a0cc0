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
