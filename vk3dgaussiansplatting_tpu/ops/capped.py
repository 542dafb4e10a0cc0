"""Saturation-truncated blend — the capped-gather fast path.

The reference's render kernel terminates per pixel once transmittance falls
below 1e-4 (RenderGaussians.comp:136-142), so elements past the point where
EVERY pixel of a tile is saturated contribute exactly zero.  On TPU the
dominant frame cost is the post-sort feature row-gather (~6.5 ns/row
regardless of width, measured), which the plain path pays for every sorted
slot.  This module truncates each tile's range to its first
`config.blend_depth_cap` sorted elements *before* the gather:

  1. build a packed element layout: per tile, its first min(r_t, cap)
     sorted slots, each tile's segment 128-lane aligned (zero leading DMA
     alignment waste in the blend kernel).  The packed slot -> source slot
     map is monotone, so it comes from the Pallas expansion kernel over the
     8160-entry tile table — no scatter, no big gather;
  2. gather gaussian ids + feature rows only for the packed slots
     (sum(min(r_t, cap)) rows instead of the full capacity);
  3. blend with the flat kernel on packed ranges, reading back the
     per-pixel outgoing transmittance (kernel row 3);
  4. exactness validation: a tile is exact iff its range fit the cap OR all
     its pixels saturated (T < stop) at the cap — T is monotone, so both
     conditions are decidable from the capped run alone.  If ANY tile fails,
     a `lax.cond` falls back to the full uncapped blend within the same
     program; the fast path's cost is paid only on frames where it is exact.

Float caveat: batch boundaries differ between the capped and uncapped
schedules, so the log2-tree transmittance products regroup and images can
differ in final-ulp floats; the quantized-image contract (+-1 8-bit,
docs/TOLERANCES.md) is unaffected.  Sort-element integer artifacts are
untouched (the truncation happens strictly after the sort).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import SENTINEL, RenderConfig
from .keygen import GaussianFrameData, SortElements
from .pallas import blend_kernel
from .pallas.compact_kernel import compact_segments
from .pallas.expand_kernel import expand_rows

SEG_ALIGN = 128  # packed per-tile segment alignment (DMA lane alignment)


def packed_capacity(config: RenderConfig, capacity: int) -> int:
    """Static packed-layout capacity: sum over tiles of the 128-aligned
    capped segment is bounded both by num_tiles * roundup(cap, 128) and by
    roundup(capacity, 128) + 128 * num_tiles.  Rounded to 512 (the segment
    compactor's batch granularity)."""
    cap_p = -(-config.blend_depth_cap // SEG_ALIGN) * SEG_ALIGN
    bound_a = config.num_tiles * cap_p
    bound_b = -(-capacity // SEG_ALIGN) * SEG_ALIGN + SEG_ALIGN * config.num_tiles
    return -(-min(bound_a, bound_b) // 512) * 512


@functools.partial(jax.jit, static_argnames=("config",))
def blend_tiles_capped(
    elements: SortElements,
    ranges,
    frame: GaussianFrameData,
    config: RenderConfig,
):
    """Capped blend with in-graph exactness fallback; returns [H, W, 3]."""
    cap = config.blend_depth_cap
    assert cap > 0, "blend_tiles_capped requires config.blend_depth_cap > 0"
    capacity = elements.tile.shape[0]
    bk = config.blend_batch_k

    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)
    r = ends - starts
    counts = jnp.minimum(r, jnp.int32(cap))
    pcounts = -(-counts // SEG_ALIGN) * SEG_ALIGN
    pcum = jnp.cumsum(pcounts)
    pstart = (pcum - pcounts).astype(jnp.int32)

    ep = packed_capacity(config, capacity)
    # Packed CHUNK (128 lanes) -> (source start, live threshold) via the
    # monotone expansion over the tile table (InitSortList's allocation
    # machinery reused at chunk granularity: ~ep/128 slots, trivially cheap).
    counts128 = pcounts // SEG_ALIGN
    pstart128 = pstart // SEG_ALIGN
    nchunks = ep // SEG_ALIGN
    cols, _ = expand_rows([starts, pstart128, counts], counts128, nchunks)
    cs = jnp.arange(nchunks, dtype=jnp.int32)
    chunk_local = (cs - cols[1]) * jnp.int32(SEG_ALIGN)
    src0 = cols[0] + chunk_local
    thr = cols[2] - chunk_local  # live lanes within the chunk
    lane = jnp.arange(SEG_ALIGN, dtype=jnp.int32)
    seg_live = (lane[None, :] < thr[:, None]).reshape(ep)

    # Piecewise-contiguous index fetch: one 256-lane DMA + dynamic lane
    # rotate per chunk (bandwidth-bound) instead of an XLA row-gather
    # (~6 ns/row regardless of contiguity).
    gid_raw = compact_segments(elements.index, src0, ep)
    live = seg_live & (gid_raw != jnp.uint32(SENTINEL))
    gid = jnp.where(live, gid_raw, jnp.uint32(0)).astype(jnp.int32)

    rows = jnp.take(
        blend_kernel.pack_feature_table(frame), gid, axis=0, mode="clip"
    )  # row-gather #2 (clip: gid already in-bounds; fill mode adds a
    # per-row OOB select)
    feat = blend_kernel.features_from_rows(
        rows, live.astype(jnp.float32), bk
    )

    pranges = jnp.stack(
        [pstart, pstart + counts], axis=1
    ).astype(jnp.uint32)
    img, t_out = blend_kernel.blend_flat_core(
        feat, pranges, config, ep, with_t=True
    )

    # Exactness: range fit the cap, or every pixel saturated at the cap.
    t_max = jnp.max(t_out, axis=1)
    valid = (r <= jnp.int32(cap)) | (
        t_max < jnp.float32(config.transmittance_stop)
    )
    ok = jnp.all(valid)

    def full_path(_):
        return blend_kernel.blend_tiles_pallas_flat(
            elements, ranges, frame, config
        )

    return lax.cond(ok, lambda _: img, full_path, 0)
