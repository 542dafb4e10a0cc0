"""Per-tile range extraction — the FindRanges pass.

The reference kernel (FindRanges.comp) runs one thread per sorted element and
writes segment boundaries where neighbouring tile keys differ.  Here it is a
vectorized neighbour-diff + two scatters (start/end), which XLA lowers to a
pair of masked scatter HLOs.

Faithful quirks reproduced:
  * sentinel tiles (0xFFFFFFFF) never get a range written
    (FindRanges.comp:32-39);
  * the *last* slot writes `end = E-1`, not E (FindRanges.comp:63-69) — with
    sentinel padding the last slot is never a live tile so the off-by-one is
    unobservable, but a completely full sort list reproduces the reference's
    behaviour of dropping its final element;
  * ranges default to (0, 0) — the per-frame buffer clear
    (Subrenderer.cpp:54-60) — so empty tiles blend nothing.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SENTINEL, RenderConfig
from .keygen import SortElements


def find_ranges(elements: SortElements, num_tiles: int):
    """Compute [num_tiles, 2] uint32 (start, end) ranges from sorted tiles."""
    tile = elements.tile
    e = tile.shape[0]
    idx = jnp.arange(e, dtype=jnp.uint32)
    sent = jnp.uint32(SENTINEL)

    prev = jnp.concatenate([tile[:1], tile[:-1]])  # tile[i-1], dummy at 0
    # Thread cases exactly as FindRanges.comp:44-70: only *interior* threads
    # (0 < i < E-1) examine the boundary with their left neighbour; thread 0
    # writes only a start; thread E-1 writes only `end = E-1` — the E-2/E-1
    # boundary is never examined (benign under sentinel padding).
    interior = (idx > 0) & (idx < jnp.uint32(e - 1))
    is_start = (idx == 0) | (interior & (tile != prev))
    start_ok = is_start & (tile != sent)
    # Scatter with out-of-range index -> dropped.
    start_tgt = jnp.where(start_ok, tile, jnp.uint32(num_tiles))
    starts = jnp.zeros((num_tiles,), dtype=jnp.uint32).at[start_tgt].set(
        idx, mode="drop", unique_indices=True
    )

    nxt = jnp.concatenate([tile[1:], tile[-1:]])  # tile[i+1], dummy at end
    # Interior boundary at i writes end[tile[i-1]] = i, i.e. in j = i-1 form:
    # j <= E-3 with tile[j] != tile[j+1] writes end = j+1.  Slot E-1 writes
    # end = E-1 for its own tile.
    last = idx == jnp.uint32(e - 1)
    end_val = jnp.where(last, jnp.uint32(e - 1), idx + 1)
    if e >= 3:
        interior_end = (idx <= jnp.uint32(e - 3)) & (tile != nxt)
    else:  # e < 3: there are no interior threads
        interior_end = jnp.zeros_like(last)
    is_end = last | interior_end
    end_ok = is_end & (tile != sent)
    end_tgt = jnp.where(end_ok, tile, jnp.uint32(num_tiles))
    ends = jnp.zeros((num_tiles,), dtype=jnp.uint32).at[end_tgt].set(
        end_val, mode="drop", unique_indices=True
    )
    return jnp.stack([starts, ends], axis=-1)
