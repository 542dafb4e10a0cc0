"""Saturation-truncated blend — the capped-gather fast path.

The reference's render kernel terminates per pixel once transmittance falls
below 1e-4 (RenderGaussians.comp:136-142), so elements past the point where
EVERY pixel of a tile is saturated contribute exactly zero.  On TPU the
dominant frame cost is the post-sort feature row-gather (~6.5 ns/row
regardless of width, measured), which the plain path pays for every sorted
slot.  This module truncates each tile's range to its first `cap_t` sorted
elements *before* the gather:

  1. build a packed element layout: per tile, its first min(r_t, cap_t)
     sorted slots, each tile's segment 128-lane aligned;
  2. gather gaussian ids + feature rows only for the packed slots
     (sum over tiles of min(r_t, cap_t) rows instead of the full capacity);
     the id fetch is the run-granular Pallas compactor (one DMA pair per
     tile, ops/pallas/compact_kernel.py:compact_runs), not a row-gather;
  3. blend with the flat kernel on packed ranges, reading back the
     per-pixel outgoing transmittance (kernel row 3);
  4. validation: a tile passes iff its range fit its cap OR all its pixels
     saturated (T < stop * cap_validation_factor) at the cap — T is
     monotone, so both conditions are decidable from the capped run alone.
     A handful of failing tiles (camera motion flips 1-3 per frame as
     gaussians cross tile boundaries) are re-blended at full range by the
     bounded PATCH PASS and merged in; only frames exceeding the patch
     budgets (or overflowing the packed layout) fall back to the full
     uncapped blend — all inside the same program via `lax.cond`.

Two cap policies:

  * `blend_tiles_capped` — one static cap for every tile
    (config.blend_depth_cap).  Exact-or-fallback per frame.
  * `blend_tiles_capped_temporal` — per-tile caps carried ACROSS frames
    (the production policy): tiles that fail validation escalate their cap
    2x (up to config.blend_cap_max) for the next frame, tiles whose range
    shrank below half their cap decay back toward the base.  After one or
    two frames of a new viewpoint the caps converge and frames take the
    fast path with zero fallback cost.  This is the temporal analogue of
    the reference's per-pixel early-out: the reference re-discovers each
    tile's saturation depth every frame with fine-grained divergent
    branches (free on a GPU, poison on a TPU); we remember it between
    frames and *verify* it in-graph each frame, falling back when the
    camera moved enough to invalidate it.  Exactness is therefore
    per-frame unconditional: a frame either validates or re-renders.

Float caveat: batch boundaries differ between the capped and uncapped
schedules, so the log2-tree transmittance products regroup and images can
differ in final-ulp floats; validation reads T under the packed grouping,
so per-pixel tails bounded by transmittance_stop (1e-4) can drop — both
absorbed by the quantized-image contract (+-1 8-bit, docs/TOLERANCES.md).
Sort-element integer artifacts are untouched (the truncation happens
strictly after the sort).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import SENTINEL, RenderConfig
from .keygen import GaussianFrameData, SortElements
from .pallas import blend_kernel
from .pallas.compact_kernel import compact_runs
from .pallas.expand_kernel import expand_rows
from .search import two_level_lex_search

SEG_ALIGN = 128  # packed per-tile segment alignment (DMA lane alignment)


class CapsState(NamedTuple):
    """Temporal per-tile state carried across frames.

    caps:  [T] i32 — blend truncation caps (the round-3 policy).
    thr:   [T] u32 — depth-key prefilter thresholds (ops/prefilter.py);
           SENTINEL disables filtering for the tile.  Tiles publish the
           depth at their capped end when margin-deep saturated; keygen
           then drops gaussians provably behind every tile they touch, and
           the capped blend truncates each filtered tile at its threshold
           CROSSING so the T-based validation proves exactness against the
           full (unfiltered) range.
    floor: [T] i32 — smallest trusted cap (the saturation-decay ratchet).
           Transmittance is only known at the CURRENT end, so decay is a
           guess; a tile whose T profile has a cliff (an opaque wall mid-
           range) would otherwise cycle decay -> invalid -> escalate
           forever.  Validation failure raises the floor to the escalated
           cap; decay never goes below it; a halved range (big scene
           change) resets it to the base cap.
    """

    caps: jax.Array
    thr: jax.Array
    floor: jax.Array


def init_caps_state(config: RenderConfig) -> CapsState:
    assert config.blend_depth_cap > 0
    return CapsState(
        caps=jnp.full((config.num_tiles,), config.blend_depth_cap, jnp.int32),
        thr=jnp.full((config.num_tiles,), jnp.uint32(SENTINEL)),
        floor=jnp.full(
            (config.num_tiles,), config.blend_depth_cap, jnp.int32
        ),
    )


def _crossing_counts(elements: SortElements, starts, r, caps, thr):
    """Per-tile blend counts under caps AND depth thresholds.

    For filtered tiles (thr != SENTINEL) the count is additionally trimmed
    at the threshold crossing — the first in-range element with
    depth > thr — found by one lexicographic search over the sorted
    (tile, depth) pairs.  Beyond the crossing the kept range may be missing
    dropped elements, so blending past it would be unverifiable; at or
    before it the kept range provably equals the unfiltered range
    (ops/prefilter.py conservativeness argument).
    """
    t = starts.shape[0]
    filtered = thr != jnp.uint32(SENTINEL)
    counts_plain = jnp.minimum(r, caps)

    def with_search(_):
        tids = jnp.arange(t, dtype=jnp.uint32)
        # probe (t, thr+1): count of pairs lex-below == global position of
        # the first element of tile t with depth > thr.  thr is clamped to
        # SENTINEL-1 when published, so the +1 never wraps (ops/search.py).
        probe_lo = jnp.minimum(thr, jnp.uint32(SENTINEL - 1)) + jnp.uint32(1)
        pcross = two_level_lex_search(
            elements.tile, elements.depth, tids, probe_lo
        )
        pfx = jnp.clip(pcross - starts, 0, r)
        return jnp.where(
            filtered, jnp.minimum(counts_plain, pfx), counts_plain
        )

    # The lex search costs ~2-3 ms at garden scale; frames whose threshold
    # map is entirely SENTINEL (warmup, fog-like scenes that never
    # publish) skip it in-graph.
    counts = lax.cond(
        jnp.any(filtered), with_search, lambda _: counts_plain, 0
    )
    return counts, filtered



def _tile_validity(t_max, r, counts, filtered, config: RenderConfig):
    """Per-tile validation shared by the monolithic and split paths: range
    fit OR saturation at the (trimmed) end — but filtered tiles may be
    missing dropped elements beyond their threshold crossing, so only
    saturation proves them (ops/prefilter.py conservativeness argument)."""
    sat = t_max < jnp.float32(
        config.transmittance_stop * config.cap_validation_factor
    )
    valid = (r <= counts) | sat
    if filtered is not None:
        valid = jnp.where(filtered, sat, valid)
    return valid


def _count_unfixable(valid, thr):
    """Invalid tiles that were prefiltered: the patch pass cannot recover
    their dropped tail, so frames with any of them are flagged not-ok."""
    return jnp.sum(
        (jnp.logical_not(valid) & (thr != jnp.uint32(SENTINEL))).astype(
            jnp.int32
        )
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def packed_capacity(config: RenderConfig, capacity: int) -> int:
    """Static packed-layout capacity for the static-cap path: bounded both
    by num_tiles * (roundup(cap, 128) + 128) and by roundup(capacity, 128)
    + 2*128 * num_tiles (each tile adds <= 128 alignment + <= 127
    misalignment-lead lanes).  Rounded to 512."""
    cap_p = _round_up(config.blend_depth_cap, SEG_ALIGN) + SEG_ALIGN
    bound_a = config.num_tiles * cap_p
    bound_b = (
        _round_up(capacity, SEG_ALIGN) + 2 * SEG_ALIGN * config.num_tiles
    )
    return _round_up(min(bound_a, bound_b), 512)


def packed_capacity_temporal(config: RenderConfig, capacity: int) -> int:
    """Static packed capacity for the temporal-caps path.

    Steady-state occupancy is sum_t roundup(off_t + min(r_t, cap_t), 128)
    where the converged cap_t ~ each tile's saturation depth; the budget
    adds `packed_slack_per_tile` slots per tile over the base cap for
    escalated tiles + alignment + misalignment lead.  Gather/blend cost is
    proportional to this STATIC size, so the slack is a real cost knob,
    not just safety."""
    cap_p = _round_up(config.blend_depth_cap, SEG_ALIGN) + SEG_ALIGN
    bound_a = config.num_tiles * (cap_p + config.packed_slack_per_tile)
    bound_b = (
        _round_up(capacity, SEG_ALIGN) + 2 * SEG_ALIGN * config.num_tiles
    )
    return _round_up(min(bound_a, bound_b), 512)


def _capped_core(
    elements: SortElements,
    ranges,
    frame: GaussianFrameData,
    config: RenderConfig,
    caps,
    ep: int,
    thr=None,
):
    """Capped blend at per-tile caps (and optional depth thresholds).

    Returns (img, t_out, valid, fits, pcum_end, counts); caps: [num_tiles]
    i32, each <= config.blend_cap_max; thr: optional [num_tiles] u32
    prefilter thresholds (CapsState.thr).
    """
    capacity = elements.tile.shape[0]
    bk = config.blend_batch_k
    # The compactor's per-tile DMA window: slab width = roundup(off +
    # count, 128) <= roundup(127 + cap_max, 128) = cap_max + 128.
    wmax = _round_up(config.blend_cap_max, SEG_ALIGN) + SEG_ALIGN

    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)
    r = ends - starts
    if thr is None:
        counts = jnp.minimum(r, caps)
        filtered = None
    else:
        counts, filtered = _crossing_counts(elements, starts, r, caps, thr)
    # Alignment-preserving slab layout (compact_kernel.py rationale): tile
    # t's run lands at sbase_t + off_t where off_t = starts_t mod 128, so
    # both compactor DMAs use provably-128-aligned offsets.
    off = starts - (starts // SEG_ALIGN) * SEG_ALIGN
    slabw = -(-(off + counts) // SEG_ALIGN) * SEG_ALIGN
    pcum = jnp.cumsum(slabw)
    sbase = (pcum - slabw).astype(jnp.int32)
    fits = pcum[-1] <= jnp.int32(ep)

    # Packed CHUNK (128 lanes) -> live lane window via the monotone
    # expansion over the tile table (InitSortList's allocation machinery
    # reused at chunk granularity: ~ep/128 slots, trivially cheap).
    counts128 = slabw // SEG_ALIGN
    sbase128 = sbase // SEG_ALIGN
    nchunks = ep // SEG_ALIGN
    cols, _ = expand_rows([sbase128, counts, off], counts128, nchunks)
    cs = jnp.arange(nchunks, dtype=jnp.int32)
    chunk_local = (cs - cols[0]) * jnp.int32(SEG_ALIGN)
    thr_lo = cols[2] - chunk_local  # first live lane within the chunk
    thr_hi = cols[2] + cols[1] - chunk_local  # one past the last live lane
    lane = jnp.arange(SEG_ALIGN, dtype=jnp.int32)
    seg_live = (
        (lane[None, :] >= thr_lo[:, None]) & (lane[None, :] < thr_hi[:, None])
    ).reshape(ep)

    # Run-granular index compaction: one (load, store) DMA pair per tile
    # instead of an XLA row-gather (~6 ns/row regardless of contiguity) or
    # a per-128-chunk DMA (issue-bound at ~100K issues).
    gid_raw = compact_runs(elements.index, starts, sbase, ep, wmax)
    live = seg_live & (gid_raw != jnp.uint32(SENTINEL))
    gid = jnp.where(live, gid_raw, jnp.uint32(0)).astype(jnp.int32)

    # The dominant row-gather, split into two width-4 gathers.  (r5 note:
    # a single width-6 table was built and A/B'd — 24 B rows sit past the
    # >16 B width cliff and the production-context pass_bench split phase
    # measured 139 vs 117 ms, so the w4 pair stands; the r4 width-probe's
    # "w5/w6 = 43 ms" row was an artifact of its [:8,:] output slice +
    # the python-loop fetch protocol.  scripts/r5_gather_ab.py.)
    ta, tb = blend_kernel.pack_feature_tables2(frame)
    rows = blend_kernel.rows_from_tables2(
        jnp.take(ta, gid, axis=0, mode="clip"),
        jnp.take(tb, gid, axis=0, mode="clip"),
    )
    feat = blend_kernel.features_from_rows(rows, live.astype(jnp.float32), bk)

    pstart = sbase + off
    pranges = jnp.stack([pstart, pstart + counts], axis=1).astype(jnp.uint32)
    img, t_out = blend_kernel.blend_flat_core(
        feat, pranges, config, ep, with_t=True
    )

    # Validity: range fit the cap, or every pixel saturated at the cap
    # (threshold = stop * cap_validation_factor; hysteresis rationale in
    # core/config.py, tail bound in docs/TOLERANCES.md).  Filtered tiles
    # may be missing dropped elements beyond their threshold crossing, so
    # "range fit" proves nothing there: only saturation at the (trimmed)
    # end validates them.
    t_max = jnp.max(t_out, axis=1)
    valid = _tile_validity(t_max, r, counts, filtered, config)
    return img, t_out, valid, fits, pcum[-1], counts


@functools.partial(jax.jit, static_argnames=("config",))
def blend_tiles_capped(
    elements: SortElements,
    ranges,
    frame: GaussianFrameData,
    config: RenderConfig,
):
    """Static-cap capped blend with in-graph exactness fallback; [H, W, 3]."""
    cap = config.blend_depth_cap
    assert cap > 0, "blend_tiles_capped requires config.blend_depth_cap > 0"
    assert cap <= config.blend_cap_max
    capacity = elements.tile.shape[0]
    ep = packed_capacity(config, capacity)
    caps = jnp.full((config.num_tiles,), cap, jnp.int32)
    img, _t, valid, fits, _pc, _cnt = _capped_core(
        elements, ranges, frame, config, caps, ep
    )
    # Static caps carry no temporal hysteresis, so validation runs at the
    # plain transmittance stop (factor 1.0) — exact-or-fallback, not
    # tolerance-or-fallback (advisor r3).
    r = (ranges[:, 1] - ranges[:, 0]).astype(jnp.int32)
    valid = (r <= caps) | (
        jnp.max(_t, axis=1) < jnp.float32(config.transmittance_stop)
    )
    ok = jnp.all(valid) & fits

    def full_path(_):
        return blend_kernel.blend_tiles_pallas_flat(
            elements, ranges, frame, config
        )

    return lax.cond(ok, lambda _: img, full_path, 0)


def _policy_update(
    config: RenderConfig,
    ep: int,
    caps,
    thr,
    floor,
    r,
    counts,
    starts,
    depth_col,
    t_max,
    valid,
    fits,
    pcum_end,
):
    """Next-frame caps (and prefilter thresholds) from this frame's
    validation — shared by the monolithic and split-phase paths.

    Caps: escalate failed tiles 2x (geometric: converges in <= log2 frames
    up to cap_max without overshooting — a 4x jump would pin 2-4x more
    packed slots than the tile's true saturation depth, and there is no
    saturation-based decay to reclaim them); decay tiles whose range shrank
    below half their cap (monotone-safe: the decayed cap still covers the
    full range, so no oscillation).  Saturation-valid tiles keep escalating
    until T clears the margin (config rationale).  Margin growth is
    headroom-gated on the PROJECTED layout size: thousands of tiles grow in
    the same frame, so gating on the current size alone overshoots the
    budget in one step and oscillates through overflow-shedding.

    Thresholds (when `thr` is not None): valid tiles below the publication
    bar (config.thr_publish_margin x stop) publish the depth key at their
    (trimmed) capped end — the prefilter fixed point; everything else
    publishes SENTINEL (unfiltered next frame).  The gap between the
    publication bar and the validation bar (cap_validation_factor) is the
    transmittance hysteresis against motion-induced unfixable frames.
    """
    base = config.blend_depth_cap
    cap_max = config.blend_cap_max
    margin_ok = t_max < jnp.float32(
        config.transmittance_stop * config.cap_escalate_margin
    )
    esc = jnp.minimum(caps * 2, jnp.int32(cap_max))
    dec = jnp.maximum(caps // 2, jnp.int32(base))
    stay = (r <= caps) | margin_ok
    n_grow = jnp.sum((valid & jnp.logical_not(stay)).astype(jnp.int32))
    room = pcum_end + n_grow * jnp.int32(128) <= jnp.int32(int(ep * 0.97))
    grow = jnp.where(
        room, jnp.minimum(caps + jnp.int32(128), jnp.int32(cap_max)), caps
    )
    # Saturation-driven decay (CapsState mode only): a truncating,
    # deeply-saturated tile walks its cap down toward the true saturation
    # depth, never below its trusted floor (config + CapsState rationale).
    if floor is not None and config.cap_decay_margin > 0:
        deep = (
            t_max
            < jnp.float32(
                config.transmittance_stop
                * config.cap_escalate_margin
                * config.cap_decay_margin
            )
        ) & (counts < r)
        hold = jnp.where(
            deep,
            jnp.maximum(caps - jnp.int32(128), jnp.maximum(floor, base)),
            caps,
        )
    else:
        hold = caps
    caps_next = jnp.where(
        valid,
        jnp.where(stay, jnp.where(r * 2 <= caps, dec, hold), grow),
        esc,
    )
    # Packed-budget overflow: shed gently until the layout re-fits.
    shed = jnp.maximum(caps - jnp.int32(128), jnp.int32(base))
    caps_next = jnp.where(fits, caps_next, shed)

    if floor is not None:
        # Failure raises the floor to the escalated cap; a halved range
        # resets it (the scene moved enough that the old cliff is stale).
        floor_next = jnp.where(jnp.logical_not(valid), esc, floor)
        floor_next = jnp.where(
            valid & (r * 2 <= caps), jnp.int32(base), floor_next
        )
    else:
        floor_next = None

    if thr is None:
        return caps_next, None, floor_next, n_grow
    e = depth_col.shape[0]
    publish_deep = t_max < jnp.float32(
        config.transmittance_stop * config.thr_publish_margin
    )
    publish = valid & publish_deep & fits
    end_pos = jnp.clip(starts + counts - 1, 0, e - 1)
    depth_end = jnp.take(depth_col, end_pos, axis=0)
    if config.thr_reset_damp:
        # Damped reset (config rationale): a currently-filtered tile that
        # stops publishing DOUBLES its threshold per frame instead of
        # snapping to SENTINEL (raising thr only ever drops FEWER
        # gaussians: safe).  Depth keys compress the scene toward small
        # values (near/far normalization), so doubling re-admits dropped
        # content geometrically in DEPTH — a halfway-to-SENTINEL ramp was
        # measured to re-admit nearly everything in one frame and still
        # spike tight steady capacities (r5 A/B, steady-frac 0.54).  The
        # additive floor guarantees progress from tiny thresholds; at
        # S/2 the ramp snaps (<= ~6 ramp frames from any threshold).
        sent = jnp.uint32(SENTINEL)
        high = thr >= sent // jnp.uint32(2)
        dbl = jnp.maximum(
            jnp.where(high, sent, thr * jnp.uint32(2)),
            sent // jnp.uint32(64),
        )
        reset = jnp.where(high, sent, dbl)
    else:
        reset = jnp.full_like(thr, jnp.uint32(SENTINEL))
    # Clamp below SENTINEL: SENTINEL means "unfiltered", and the crossing
    # search probes thr + 1 (wraparound restriction, ops/search.py).
    thr_next = jnp.where(
        publish,
        jnp.minimum(depth_end, jnp.uint32(SENTINEL - 1)),
        reset,
    )
    return caps_next, thr_next, floor_next, n_grow


@functools.partial(jax.jit, static_argnames=("config",))
def blend_tiles_capped_temporal(
    elements: SortElements,
    ranges,
    frame: GaussianFrameData,
    config: RenderConfig,
    caps,
):
    """Per-tile temporal-caps blend.

    Args:
      caps: per-tile temporal state from the previous frame — either a
            [num_tiles] int32 caps array (init_caps) or a CapsState
            (init_caps_state) to also enable the depth-threshold prefilter
            publication.  The state kind is static: the return's caps_next
            mirrors the input kind.

    Returns (image [H, W, 3], caps_next, ok []).  The frame is exact
    within the quantized-image contract (docs/TOLERANCES.md) regardless of
    `ok` — PROVIDED keygen was not prefiltered, or every prefiltered tile
    validates: validated tiles drop per-pixel tails bounded by
    transmittance_stop * cap_validation_factor, and invalid frames take
    the in-graph full fallback.  A prefiltered (thr != SENTINEL) tile that
    fails validation cannot be repaired from the filtered element list; it
    is patched best-effort, `ok` reports 0, and its threshold resets —
    snap-to-SENTINEL (1 flagged frame per event) with thr_reset_damp off,
    or a doubling ramp of up to ~6 flagged frames with the default damped
    reset (see ops/prefilter.py and core/config.py).
    """
    base = config.blend_depth_cap
    assert base > 0
    cap_max = config.blend_cap_max
    capacity = elements.tile.shape[0]
    ep = packed_capacity_temporal(config, capacity)

    is_state = isinstance(caps, CapsState)
    thr = caps.thr if is_state else None
    floor = caps.floor if is_state else None
    caps = (caps.caps if is_state else caps).astype(jnp.int32)
    caps = jnp.clip(caps, base, cap_max)
    img, _t, valid, fits, pcum_end, counts = _capped_core(
        elements, ranges, frame, config, caps, ep, thr
    )
    ok = jnp.all(valid) & fits

    starts = ranges[:, 0].astype(jnp.int32)
    r = ranges[:, 1].astype(jnp.int32) - starts
    t_max = jnp.max(_t, axis=1)
    caps_next, thr_next, floor_next, _n_grow = _policy_update(
        config, ep, caps, thr, floor, r, counts, starts, elements.depth,
        t_max, valid, fits, pcum_end,
    )

    def full_path(_):
        return blend_kernel.blend_tiles_pallas_flat(
            elements, ranges, frame, config
        )

    n_invalid = jnp.sum(jnp.logical_not(valid).astype(jnp.int32))
    patchable = (
        fits
        & (n_invalid <= jnp.int32(PATCH_TILES))
        & jnp.all(
            jnp.where(valid, True, r <= jnp.int32(PATCH_WMAX - SEG_ALIGN))
        )
    )

    def patch_or_full(_):
        return lax.cond(
            patchable,
            lambda _: _patch_pass(
                img, valid, elements, ranges, frame, config
            ),
            full_path,
            0,
        )

    img = lax.cond(ok, lambda _: img, patch_or_full, 0)
    ok = ok | patchable
    if thr is not None:
        # A patched prefiltered tile is still missing its dropped tail:
        # only frames whose invalid tiles were all unfiltered count as ok.
        ok = ok & (_count_unfixable(valid, thr) == 0)
        return img, CapsState(caps=caps_next, thr=thr_next, floor=floor_next), ok
    return img, caps_next, ok


def init_caps(config: RenderConfig):
    """Initial per-tile caps for the temporal policy."""
    assert config.blend_depth_cap > 0
    return jnp.full((config.num_tiles,), config.blend_depth_cap, jnp.int32)


# Bounded patch pass: per-frame camera motion flips a FEW tiles invalid
# (gaussians crossing tile boundaries change a capped prefix discretely, so
# no validation hysteresis can absorb it — measured 1-3 flips/frame at
# garden scale).  Rather than paying the whole-frame full-blend fallback
# for 1-3 tiles, the patch pass re-blends JUST the invalid tiles with
# their full ranges and merges them in.  Static budgets: up to PATCH_TILES
# tiles, each with range <= PATCH_WMAX - 128; frames exceeding either
# (scene changes, warmup escalation) take the full fallback.
PATCH_TILES = 16
# Per-tile patch window (128-multiple).  A flipped tile whose range
# exceeds this forces the WHOLE-FRAME full fallback (~225 ms at garden
# scale vs ~8 ms patched); garden's hottest tiles run past 16K elements,
# and the r4 median-block bench showed ~10/77 frames paying the fallback.
# 32K was tried in r4 and measured at noise level (the not-ok frames were
# prefilter-miss flags, not patch-budget misses); 16K stands.
PATCH_WMAX = 16384


def _patch_pass(img, valid, elements, ranges, frame, config: RenderConfig):
    """Re-blend the (<= PATCH_TILES) invalid tiles at full range; returns
    the merged [H, W, 3] image.  Caller guarantees the budgets hold."""
    t = config.num_tiles
    bk = config.blend_batch_k
    ep_patch = PATCH_TILES * PATCH_WMAX

    score = jnp.where(
        valid, jnp.int32(-1), jnp.arange(t, dtype=jnp.int32)
    )
    tvals = jax.lax.top_k(score, PATCH_TILES)[0]  # invalid tile ids or -1
    is_real = tvals >= 0
    t_idx = jnp.maximum(tvals, 0)
    starts_p = jnp.where(is_real, ranges[t_idx, 0].astype(jnp.int32), 0)
    ends_p = jnp.where(is_real, ranges[t_idx, 1].astype(jnp.int32), 0)
    r_p = jnp.maximum(ends_p - starts_p, 0)

    off = starts_p - (starts_p // SEG_ALIGN) * SEG_ALIGN
    slabw = -(-(off + r_p) // SEG_ALIGN) * SEG_ALIGN
    pcum = jnp.cumsum(slabw)
    sbase = (pcum - slabw).astype(jnp.int32)

    gid_raw = compact_runs(
        elements.index, starts_p, sbase, ep_patch, PATCH_WMAX
    )
    # live mask at chunk granularity: 16 slabs only — direct XLA
    nchunks = ep_patch // SEG_ALIGN
    chunk = jnp.arange(nchunks, dtype=jnp.int32)
    slab_of = jnp.searchsorted(
        (pcum // SEG_ALIGN).astype(jnp.int32), chunk, side="right"
    ).astype(jnp.int32)
    slab_of = jnp.minimum(slab_of, PATCH_TILES - 1)
    chunk_local = (chunk - (sbase // SEG_ALIGN)[slab_of]) * SEG_ALIGN
    lo = off[slab_of] - chunk_local
    hi = off[slab_of] + r_p[slab_of] - chunk_local
    lane = jnp.arange(SEG_ALIGN, dtype=jnp.int32)
    seg_live = (
        (lane[None, :] >= lo[:, None]) & (lane[None, :] < hi[:, None])
    ).reshape(ep_patch)
    live = seg_live & (gid_raw != jnp.uint32(SENTINEL))
    gid = jnp.where(live, gid_raw, jnp.uint32(0)).astype(jnp.int32)

    # Narrow split gathers (width-4 rows) — with camera motion flipping
    # 1-3 tiles the patch pass runs on MOST frames, so its gather format
    # matters too (same w4-pair rationale as _capped_core).
    ta, tb = blend_kernel.pack_feature_tables2(frame)
    rows = blend_kernel.rows_from_tables2(
        jnp.take(ta, gid, axis=0, mode="clip"),
        jnp.take(tb, gid, axis=0, mode="clip"),
    )
    feat = blend_kernel.features_from_rows(rows, live.astype(jnp.float32), bk)

    # tile -> patch-slab mapping as a tiny [T, PATCH_TILES] one-hot
    onehot = (
        jnp.arange(t, dtype=jnp.int32)[:, None] == tvals[None, :]
    ).astype(jnp.int32)
    pstart_t = onehot @ (sbase + off)
    count_t = onehot @ r_p
    pranges = jnp.stack([pstart_t, pstart_t + count_t], axis=1).astype(
        jnp.uint32
    )
    img_p = blend_kernel.blend_flat_core(feat, pranges, config, ep_patch)

    gh, gw, ts = config.grid_height, config.grid_width, config.tile_size
    vmask = jnp.broadcast_to(
        valid.reshape(gh, 1, gw, 1), (gh, ts, gw, ts)
    ).reshape(gh * ts, gw * ts)[: config.height, : config.width]
    return jnp.where(vmask[:, :, None], img, img_p)


# ---------------------------------------------------------------------------
# Split-phase temporal path (chained-dispatch tier).
#
# XLA's TPU row-gather runs ~2x slower when its operands are in-graph
# intermediates than when they are program PARAMETERS (measured 2026-08-21,
# scripts/pass_bench.py isolation matrix: 140 ms vs 72 ms at 6.27M rows from
# a [5.8M, 10] table — an operand-layout effect; an optimization_barrier
# does not recover it).  The monolithic blend_tiles_capped_temporal
# necessarily computes the feature table and packed indices in-graph; this
# split runs the dominant gather in its own program with both operands as
# parameters.  bench.py's chained dispatch (which already runs per-pass
# programs) uses these three phases; the monolithic form remains for
# single-program callers.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def capped_layout(elements, ranges, frame, config: RenderConfig, caps):
    """Phase 1: packed layout + index compaction + feature table.

    caps: [T] i32 caps array or CapsState (enables threshold trimming).
    Returns (ta, tb [N,4], gid [ep] i32, live [ep] f32, pstart, counts,
    r, fits, pcum_end)."""
    capacity = elements.tile.shape[0]
    ep = packed_capacity_temporal(config, capacity)
    wmax = _round_up(config.blend_cap_max, SEG_ALIGN) + SEG_ALIGN

    is_state = isinstance(caps, CapsState)
    thr = caps.thr if is_state else None
    caps = jnp.clip((caps.caps if is_state else caps).astype(jnp.int32),
                    config.blend_depth_cap, config.blend_cap_max)
    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)
    r = ends - starts
    if thr is None:
        counts = jnp.minimum(r, caps)
    else:
        counts, _filtered = _crossing_counts(elements, starts, r, caps, thr)
    off = starts - (starts // SEG_ALIGN) * SEG_ALIGN
    slabw = -(-(off + counts) // SEG_ALIGN) * SEG_ALIGN
    pcum = jnp.cumsum(slabw)
    sbase = (pcum - slabw).astype(jnp.int32)
    fits = pcum[-1] <= jnp.int32(ep)

    counts128 = slabw // SEG_ALIGN
    sbase128 = sbase // SEG_ALIGN
    nchunks = ep // SEG_ALIGN
    cols, _ = expand_rows([sbase128, counts, off], counts128, nchunks)
    cs = jnp.arange(nchunks, dtype=jnp.int32)
    chunk_local = (cs - cols[0]) * jnp.int32(SEG_ALIGN)
    thr_lo = cols[2] - chunk_local
    thr_hi = cols[2] + cols[1] - chunk_local
    lane = jnp.arange(SEG_ALIGN, dtype=jnp.int32)
    seg_live = (
        (lane[None, :] >= thr_lo[:, None]) & (lane[None, :] < thr_hi[:, None])
    ).reshape(ep)

    gid_raw = compact_runs(elements.index, starts, sbase, ep, wmax)
    live = seg_live & (gid_raw != jnp.uint32(SENTINEL))
    gid = jnp.where(live, gid_raw, jnp.uint32(0)).astype(jnp.int32)
    ta, tb = blend_kernel.pack_feature_tables2(frame)
    pstart = sbase + off
    return (
        ta, tb, gid, live.astype(jnp.float32), pstart, counts, r, fits,
        pcum[-1],
    )


@functools.partial(jax.jit, static_argnames=("bk",))
def capped_gather(ta, tb, gid, live, bk: int):
    """Phase 2: THE dominant row-gather — two width-4 gathers with
    parameter operands (row-byte cost scaling; w4-pair rationale in
    _capped_core)."""
    rows = blend_kernel.rows_from_tables2(
        jnp.take(ta, gid, axis=0, mode="clip"),
        jnp.take(tb, gid, axis=0, mode="clip"),
    )
    return blend_kernel.features_from_rows(rows, live, bk)


@functools.partial(jax.jit, static_argnames=("config", "ep"))
def capped_finish(
    feat,
    pstart,
    counts,
    r,
    fits,
    pcum_end,
    caps,
    elements,
    ranges,
    frame,
    config: RenderConfig,
    ep: int,
):
    """Phase 3: blend + validation + caps/thresholds update + in-graph
    fallback.  `caps` is a [T] i32 array or CapsState; caps_next mirrors
    the input kind."""
    is_state = isinstance(caps, CapsState)
    thr = caps.thr if is_state else None
    floor = caps.floor if is_state else None
    caps = jnp.clip((caps.caps if is_state else caps).astype(jnp.int32),
                    config.blend_depth_cap, config.blend_cap_max)
    pranges = jnp.stack([pstart, pstart + counts], axis=1).astype(jnp.uint32)
    img, t_out = blend_kernel.blend_flat_core(
        feat, pranges, config, ep, with_t=True
    )
    t_max = jnp.max(t_out, axis=1)
    valid = _tile_validity(
        t_max, r, counts,
        (thr != jnp.uint32(SENTINEL)) if thr is not None else None,
        config,
    )
    ok = jnp.all(valid) & fits

    starts = ranges[:, 0].astype(jnp.int32)
    caps_next, thr_next, floor_next, n_grow = _policy_update(
        config, ep, caps, thr, floor, r, counts, starts, elements.depth,
        t_max, valid, fits, pcum_end,
    )

    def full_path(_):
        return blend_kernel.blend_tiles_pallas_flat(
            elements, ranges, frame, config
        )

    # Bounded patch pass for a handful of flipped tiles (see _patch_pass).
    n_invalid = jnp.sum(jnp.logical_not(valid).astype(jnp.int32))
    patchable = (
        fits
        & (n_invalid <= jnp.int32(PATCH_TILES))
        & jnp.all(
            jnp.where(valid, True, r <= jnp.int32(PATCH_WMAX - SEG_ALIGN))
        )
    )

    def patch_or_full(_):
        return lax.cond(
            patchable,
            lambda _: _patch_pass(
                img, valid, elements, ranges, frame, config
            ),
            full_path,
            0,
        )

    img = lax.cond(ok, lambda _: img, patch_or_full, 0)
    ok = ok | patchable  # "cheap path" indicator for stats/telemetry
    if thr is not None:
        # A patched prefiltered tile is still missing its dropped tail.
        n_unfix = _count_unfixable(valid, thr)
        ok = ok & (n_unfix == 0)
    else:
        n_unfix = jnp.int32(0)
    stats = jnp.stack(
        [
            n_invalid,
            fits.astype(jnp.int32),
            pcum_end.astype(jnp.int32),
            n_grow,
            n_unfix,
        ]
    )
    caps_out = (
        CapsState(caps=caps_next, thr=thr_next, floor=floor_next)
        if is_state
        else caps_next
    )
    return img, caps_out, ok, stats


def blend_tiles_capped_split(elements, ranges, frame, config, caps):
    """Three-program temporal capped blend (see split-phase rationale).

    Like blend_tiles_capped_temporal but dispatches three jitted programs
    (intermediate arrays stay on device) and additionally returns a
    diagnostics vector: returns (img, caps_next, ok,
    [n_invalid, fits, packed_end, n_grow, n_unfix]).  `caps` may be a
    [T] i32 array or a CapsState (threshold prefilter enabled)."""
    capacity = elements.tile.shape[0]
    ep = packed_capacity_temporal(config, capacity)
    ta, tb, gid, live, pstart, counts, r, fits, pcum_end = capped_layout(
        elements, ranges, frame, config, caps
    )
    feat = capped_gather(ta, tb, gid, live, config.blend_batch_k)
    return capped_finish(
        feat, pstart, counts, r, fits, pcum_end, caps, elements, ranges,
        frame, config, ep,
    )
