"""Pallas TPU monotone-expansion kernel — the InitSortList element allocation.

Replaces the `jnp.repeat(packed, counts, total_repeat_length=capacity)` step
of ops/keygen.py (the reference's atomicAdd slot allocation,
InitSortList.comp:129-150).  XLA lowers that repeat to a scatter (indicator
build) plus a per-row gather, both pathological on this TPU stack (scatter
~100 ms at 8M; gather ~6.5 ns/row regardless of width — ~190 ms total at
Garden-30k scale).  This kernel exploits the *monotone* structure the repeat
hides: slot j's source row r(j) = #{i : cum_i <= j} is non-decreasing, so a
window of W consecutive slots draws from a narrow band of source rows.

Round-3 rework (2026-08-21) — the round-2 kernel was DMA-issue and crossbar
bound, and its 512-aligned chunk starts made multi-chunk refills the COMMON
case on real cull patterns (keygen 61 ms real vs 34.9 ms synthetic):

  * chunk starts are the window's EXACT first source row aligned down to
    128 (the Mosaic DMA-alignment minimum) instead of 512, so a window
    refills only when its true span exceeds ~384 rows — rare;
  * the per-window source-block count n_src = ceil((misalign + span)/128)
    is precomputed XLA-side and shipped through SCALAR prefetch; both the
    compare and the value-crossbar loops skip blocks >= n_src with
    pl.when on scalar conditions.  (Round 2's band-skip attempt derived
    the predicates from vreg reductions — scalar extraction cost ate the
    win; scalar-prefetch predicates are free.)
  * the count is a blocked flat compare: per 128-row block, the cum row is
    transposed to a [128, 1] column (the [1,128]->[128,1] transpose is the
    round-2-proven shape) and compared against the [1, W] slot ids; the
    per-chunk group layout (second DMA stream + its XLA-side build) is
    gone — it was only meaningful for 512-aligned chunk starts;
  * one HBM input instead of two: [8, N] = 7 value rows + the cumsum row.

Per 512-slot window (one grid step):

  1. the window's first source row comes from a two-level XLA-side
     searchsorted over the inclusive cumsum (one probe per window);
  2. one [8, 512] slice of the packed source table is DMA'd to VMEM,
     double-buffered across windows — plus a SECOND pipelined 512-row
     chunk when the scalar-prefetched span bound exceeds one chunk (the
     common case under prefilter-thinned counts, r4);
  3. the covering row of each slot is the compare-count
     cnt[j] = sum_i (cum[i] <= j), counted over the first n_src 128-row
     blocks only (rows beyond the window's span satisfy cum > j by
     construction);
  4. the expansion itself is Mosaic's vreg lane-crossbar
     (`tpu.dynamic_gather`, reached via `jnp.take_along_axis(x, idx,
     axis=1)` with idx.shape == x.shape): 4 slot lane-groups x n_src
     source lane-groups of [8, 128] gathers + selects, moving all 8 rows
     per op;
  5. a `while_loop` refills further 512-row chunks for the rare window
     whose source span exceeds both pipelined chunks (long culled runs,
     or >1024 rows per window).

Slots past the live total search for min(j, total-1) instead of j so the
final mixed live/dead window terminates without scanning the tail of the
gaussian table; dead slots are masked to sentinels by the caller exactly as
before (the reference's overflow-drop rule keeps applying).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..search import two_level_left_search
from .common import interpret_mode

# Slots per window == source rows per chunk.  One lane-group is 128; the
# vreg crossbar gathers within 128 lanes, so both decompose into
# WINDOW/128 static groups.  Span handling (r4): the serial refill DMA is
# fine for RARE long spans, but prefilter-thinned counts (mean ~1 element
# per source row) push nearly every window's span past one 512-row chunk
# and the kernel more than doubles.  Remedies that enlarge the DMA or the
# buffer MISCOMPILE server-side (1024-wide chunks/windows: refill lanes
# return zeros on device while interpret is bit-exact) — so each window
# (when wide_span) instead PREFETCHES a second 512-row chunk and
# processes it UNCONDITIONALLY — a scalar-gated DMA + lax.cond around the
# processing was ~2x slower than just doing the work (Mosaic branch
# machinery; r4 steady breakdown).  Spans up to 1024 rows stay fully
# pipelined; the serial refill remains for the tail.
WINDOW = 512
GROUP = 128
NBLOCKS = WINDOW // GROUP  # 4
NUM_ROWS = 8  # 7 value rows + the cumsum control row
CUM_ROW = NUM_ROWS - 1
MAX_COLS = NUM_ROWS - 1
ALIGN = 128  # chunk-start alignment (Mosaic dynamic-DMA minimum)
MAX_NSRC = 2 * NBLOCKS  # span bound covered by the two pipelined chunks

_HUGE = 2**31 - 1


def _count_blocked(vbuf, j_eff, nsrc):
    """cnt[j] = #{rows i in chunk : cum[i] <= j_eff[j]}, blocked.

    vbuf: [NUM_ROWS, WINDOW] chunk (row CUM_ROW = inclusive cumsum).
    j_eff: [1, W] i32 clipped slot ids.
    nsrc:  scalar i32 — only the first nsrc 128-row blocks can satisfy
           cum <= j for this window's slots; later blocks are skipped.
    Returns [1, W] i32 in [0, nsrc*GROUP].
    """
    cnt = jnp.zeros((1, WINDOW), jnp.int32)
    for h in range(NBLOCKS):
        # Block h's cum values as a [GROUP, 1] column (proven transpose
        # shape) -> broadcast compare against all W slots.
        col = vbuf[CUM_ROW : CUM_ROW + 1, h * GROUP : (h + 1) * GROUP].T
        blk = jnp.sum(
            (col <= j_eff).astype(jnp.int32), axis=0, keepdims=True
        )  # [1, W]
        cnt = cnt + jnp.where(jnp.int32(h) < nsrc, blk, 0)
    return cnt


def _gather_groups(vals_buf, local, found, nsrc):
    """Expand one chunk: out[:, j] = vals_buf[:, local[j]] where found[j].

    vals_buf: [NUM_ROWS, WINDOW] i32 chunk of source rows (lanes = rows).
    local:    [1, WINDOW] i32 covering-row index within the chunk.
    found:    [1, WINDOW] bool — lanes whose covering row is in this chunk.
    nsrc:     scalar i32 — source blocks beyond it hold no covering rows.
    Returns [NUM_ROWS, WINDOW] i32 with unfound lanes zero.
    """
    out_groups = []
    for g in range(NBLOCKS):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        idx_g = local[:, sl]  # [1, GROUP]
        fnd_g = jnp.broadcast_to(found[:, sl], (NUM_ROWS, GROUP))
        acc_g = jnp.zeros((NUM_ROWS, GROUP), jnp.int32)
        for h in range(NBLOCKS):
            lidx = idx_g - jnp.int32(h * GROUP)
            valid = fnd_g & jnp.broadcast_to(
                (lidx >= 0) & (lidx < GROUP), (NUM_ROWS, GROUP)
            )
            lidx_c = jnp.broadcast_to(
                jnp.clip(lidx, 0, GROUP - 1), (NUM_ROWS, GROUP)
            )
            src = vals_buf[:, h * GROUP : (h + 1) * GROUP]
            gth = jnp.take_along_axis(src, lidx_c, axis=1)
            picked = jnp.where(valid, gth, acc_g)
            # Crossbars are the kernel's budget (85 ns per [8,128] op);
            # skip source blocks the window's span provably never reaches.
            acc_g = jnp.where(jnp.int32(h) < nsrc, picked, acc_g)
        out_groups.append(acc_g)
    return jnp.concatenate(out_groups, axis=1)


def _expand_kernel(
    sw_ref,  # [B] i32 scalar-prefetch: 128-aligned first source row / window
    nsrc_ref,  # [B] i32 scalar-prefetch: source blocks covering the span
    total_ref,  # [1] i32 scalar-prefetch: live element count (cum[-1])
    vals_hbm,  # [NUM_ROWS, N_pad] i32 packed source rows (row 7 = cumsum)
    out_ref,  # [NUM_ROWS, WINDOW] block at (0, b)
    vals_buf,  # [2, 2, NUM_ROWS, WINDOW] VMEM scratch (slot, chunk)
    sems,  # DMA semaphores [2, 2]
    *,
    n_pad: int,
    wide: bool,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = lax.rem(b, 2)
    max_start = n_pad - WINDOW
    total = total_ref[0]

    def dma(buf_slot, chunk, row0):
        row0 = jnp.minimum(row0, max_start)
        row0 = pl.multiple_of(row0, ALIGN)
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(row0, WINDOW)],
            vals_buf.at[buf_slot, chunk],
            sems.at[buf_slot, chunk],
        )

    # Windows are live iff their first slot is below the live total;
    # liveness is monotone in b, so dead windows never interleave live ones.
    live_w = b * jnp.int32(WINDOW) < total

    def start_pair(buf_slot, w):
        # Wide mode prefetches a pipelined chunk PAIR unconditionally: a
        # scalar-gated second DMA + a scalar lax.cond around its
        # processing was measured ~2x slower than just doing the work
        # (Mosaic branch machinery, r4 steady breakdown: 78.7 ms filtered
        # keygen vs 43.5 unfiltered).
        dma(buf_slot, 0, sw_ref[w]).start()
        if wide:
            dma(buf_slot, 1, sw_ref[w] + jnp.int32(WINDOW)).start()

    @pl.when((b == 0) & live_w)
    def _():
        start_pair(0, 0)

    @pl.when((b + 1 < nb) & ((b + 1) * jnp.int32(WINDOW) < total))
    def _():
        start_pair(1 - slot, b + 1)

    @pl.when(jnp.logical_not(live_w))
    def _():
        # Fully-dead window (overflow-drop tail): the caller masks these
        # slots to sentinels; skip the DMA + count machinery entirely.
        out_ref[:, :] = jnp.zeros((NUM_ROWS, WINDOW), jnp.int32)

    @pl.when(live_w)
    def _():
        dma(slot, 0, sw_ref[b]).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
        j = b * jnp.int32(WINDOW) + lane
        j_eff = jnp.maximum(jnp.minimum(j, total - 1), 0)  # [1, W]

        def process_chunk(vbuf, searching, acc, nsrc):
            # `searching` is an i32 0/1 mask: Mosaic cannot carry i1
            # vectors through `lax.while_loop` (scf.yield legalization
            # fails on vpad'd i1).
            cnt = _count_blocked(vbuf, j_eff, nsrc)
            covered = nsrc * jnp.int32(GROUP)
            found_here = (searching > 0) & (cnt < covered)
            gathered = _gather_groups(vbuf, cnt, found_here, nsrc)
            acc = acc + gathered  # unfound lanes contribute 0
            searching = jnp.where(cnt >= covered, searching, 0)
            return searching, acc

        searching0 = jnp.ones((1, WINDOW), jnp.int32)
        acc0 = jnp.zeros((NUM_ROWS, WINDOW), jnp.int32)
        nsrc_b = nsrc_ref[b]
        searching2, acc2 = process_chunk(
            vals_buf[slot, 0], searching0, acc0,
            jnp.minimum(nsrc_b, jnp.int32(NBLOCKS)),
        )

        if wide:
            # Second pipelined chunk, processed unconditionally (windows
            # whose span fits chunk 1 get nsrc - NBLOCKS <= 0: zero
            # covered blocks, nothing gathered, searching unchanged).
            # A tail window whose second chunk start was DMA-clamped holds
            # the table's FINAL rows at a shifted position: the span-bound
            # gating no longer lines up, so process all of its blocks —
            # chunk content is self-consistent (sorted cum + local
            # compare-count) wherever it starts.
            dma(slot, 1, sw_ref[b] + jnp.int32(WINDOW)).wait()
            shifted2 = sw_ref[b] + jnp.int32(WINDOW) > jnp.int32(max_start)
            nb2 = jnp.where(
                shifted2, jnp.int32(NBLOCKS), nsrc_b - jnp.int32(NBLOCKS)
            )
            searching2, acc2 = process_chunk(
                vals_buf[slot, 1], searching2, acc2, nb2
            )

        # Rare slow path: the window's span exceeds the pipelined chunks
        # (long culled runs or extreme thinning).  Serial refill into the
        # first chunk buffer — the next window's prefetch lives in the
        # other slot.  Clamped (tail) chunks are processed, not refused:
        # the loop ends once the previously processed chunk already
        # started at the clamped end (r4 fix — refusing clamped refills
        # orphaned covering rows in [sw + c*W, n) for tail windows whose
        # span crosses n_pad - W; full-block processing makes a shifted
        # chunk's compare-count self-consistent).
        c0 = 2 if wide else 1

        def cond(carry):
            c, searching, _ = carry
            prev_start = jnp.minimum(
                sw_ref[b] + (c - 1) * jnp.int32(WINDOW), jnp.int32(max_start)
            )
            return (jnp.max(searching) > 0) & (
                prev_start < jnp.int32(max_start)
            )

        def body(carry):
            c, searching, acc = carry
            row0 = sw_ref[b] + c * jnp.int32(WINDOW)
            d = dma(slot, 0, row0)
            d.start()
            d.wait()
            searching, acc = process_chunk(
                vals_buf[slot, 0], searching, acc, jnp.int32(NBLOCKS)
            )
            return c + 1, searching, acc

        _, _, acc = lax.while_loop(
            cond, body, (jnp.int32(c0), searching2, acc2)
        )
        out_ref[:, :] = acc


# --- streamed-window variant (round 5) -----------------------------------
#
# The per-window kernel above issues 1-2 chunk DMAs per 512-slot window and
# pays the grid-step machinery per window (~0.7-1.2 us/window measured on
# the r5 stack).  The streamed kernel amortizes both: one grid step handles
# STREAM_K consecutive windows backed by ONE contiguous chunk-buffer DMA of
# STREAM_C 512-row chunks (double-buffered across grid steps).  The source
# table is laid out chunk-major ([n_chunks, 8, 512]) XLA-side so the whole
# buffer is a single dynamic leading-index copy; each window then processes
# its two covering chunks via dynamic chunk indices into the buffer — the
# compare-count is self-consistent from any chunk start (rows before the
# window's first covering row satisfy cum <= j and are part of the count),
# so per-window work is IDENTICAL to the wide-span kernel's two
# process_chunk calls, with the per-window DMAs and grid overhead gone.
# Windows whose span escapes the buffer fall back to the serial refill loop
# (per-window chunk DMAs from the absolute row), as before.

STREAM_K = 8  # windows per grid step
STREAM_C = 12  # 512-row chunks per grid-step buffer (>= spans of K windows)


def _stream_kernel(
    s_ref,  # [B] i32: 512-aligned first chunk row of each grid step
    c1_ref,  # [BK] i32: window's first covering chunk (buffer index, clamped)
    n1_ref,  # [BK] i32: blocks to count in chunk 1 (0 => escaped buffer)
    n2_ref,  # [BK] i32: blocks to count in chunk 2
    rb_ref,  # [BK] i32: absolute first refill row for the serial path
    total_ref,  # [1] i32: live element count
    vals_hbm,  # [n_chunks, NUM_ROWS, WINDOW] i32 chunk-major source table
    out_ref,  # [NUM_ROWS, STREAM_K * WINDOW] block at (0, b)
    buf,  # [2, STREAM_C, NUM_ROWS, WINDOW] VMEM chunk buffer
    rbuf,  # [1, NUM_ROWS, WINDOW] VMEM refill scratch
    sems,  # [2] buffer DMA semaphores
    rsem,  # [1] refill DMA semaphore
    *,
    n_chunks: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = lax.rem(b, 2)
    total = total_ref[0]
    kw = jnp.int32(STREAM_K * WINDOW)
    max_chunk = n_chunks - STREAM_C
    max_start = n_chunks * WINDOW - WINDOW

    def dma_step(buf_slot, step):
        c0 = jnp.minimum(s_ref[step] // jnp.int32(WINDOW), max_chunk)
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(c0, STREAM_C)],
            buf.at[buf_slot],
            sems.at[buf_slot],
        )

    def dma_refill(row0):
        # Refill bases are whole-chunk aligned by construction (S + k*W, or
        # the escaped window's row aligned down to its chunk XLA-side; the
        # compare-count absorbs extra leading rows, which satisfy cum <= j).
        c = jnp.minimum(row0, max_start) // jnp.int32(WINDOW)
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(c, 1)], rbuf.at[pl.ds(0, 1)], rsem
        )

    live_step = b * kw < total

    @pl.when((b == 0) & live_step)
    def _():
        dma_step(0, 0).start()

    @pl.when((b + 1 < nb) & ((b + 1) * kw < total))
    def _():
        dma_step(1 - slot, b + 1).start()

    @pl.when(jnp.logical_not(live_step))
    def _():
        out_ref[:, :] = jnp.zeros((NUM_ROWS, STREAM_K * WINDOW), jnp.int32)

    @pl.when(live_step)
    def _():
        dma_step(slot, b).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)

        for w in range(STREAM_K):
            i = b * jnp.int32(STREAM_K) + jnp.int32(w)
            j = (b * kw + jnp.int32(w * WINDOW)) + lane
            j_eff = jnp.maximum(jnp.minimum(j, total - 1), 0)

            def process_chunk(vbuf, searching, acc, nsrc, j_eff=j_eff):
                cnt = _count_blocked(vbuf, j_eff, nsrc)
                covered = nsrc * jnp.int32(GROUP)
                found_here = (searching > 0) & (cnt < covered)
                gathered = _gather_groups(vbuf, cnt, found_here, nsrc)
                acc = acc + gathered
                searching = jnp.where(cnt >= covered, searching, 0)
                return searching, acc

            c1 = c1_ref[i]
            searching, acc = process_chunk(
                buf[slot, c1],
                jnp.ones((1, WINDOW), jnp.int32),
                jnp.zeros((NUM_ROWS, WINDOW), jnp.int32),
                n1_ref[i],
            )
            c2 = jnp.minimum(c1 + 1, jnp.int32(STREAM_C - 1))
            searching, acc = process_chunk(
                buf[slot, c2], searching, acc, n2_ref[i]
            )

            # Serial refill for spans that escape the buffer (rare).  The
            # refill base is whole-chunk granular; leading rows before the
            # window's span are absorbed by the compare-count.
            def cond(carry, i=i):
                t, searching, _ = carry
                prev = jnp.minimum(
                    rb_ref[i] + (t - 1) * jnp.int32(WINDOW),
                    jnp.int32(max_start),
                )
                return (jnp.max(searching) > 0) & (prev < jnp.int32(max_start))

            def body(carry, i=i, process_chunk=process_chunk):
                t, searching, acc = carry
                d = dma_refill(rb_ref[i] + t * jnp.int32(WINDOW))
                d.start()
                d.wait()
                searching, acc = process_chunk(
                    rbuf[0], searching, acc, jnp.int32(NBLOCKS)
                )
                return t + 1, searching, acc

            _, _, acc = lax.while_loop(cond, body, (jnp.int32(0), searching, acc))
            out_ref[:, w * WINDOW : (w + 1) * WINDOW] = acc


@functools.partial(jax.jit, static_argnames=("capacity",))
def expand_rows_streamed(packed_cols, counts, capacity: int):
    """Monotone fixed-capacity expansion, streamed-window kernel.

    Semantics identical to :func:`expand_rows` (and to ``jnp.repeat`` with
    ``total_repeat_length=capacity``); see the streamed-variant note above
    for the performance rationale.  Covers both the thinned (prefilter
    steady) and dense count regimes without a wide_span switch: the
    grid-step buffer holds STREAM_C chunks regardless of density.
    """
    n = counts.shape[0]
    cum = jnp.cumsum(counts, dtype=jnp.int32)
    total = cum[-1] if n > 0 else jnp.int32(0)

    n_pad = max(-(-n // WINDOW) * WINDOW, STREAM_C * WINDOW)
    n_chunks = n_pad // WINDOW
    num_windows = -(-capacity // WINDOW)
    num_steps = -(-num_windows // STREAM_K)
    nw_pad = num_steps * STREAM_K

    rows = [r.astype(jnp.int32) for r in packed_cols]
    assert len(rows) <= MAX_COLS
    while len(rows) < MAX_COLS:
        rows.append(jnp.zeros((n,), jnp.int32))
    pad = n_pad - n
    rows = [jnp.pad(r, (0, pad)) for r in rows]
    cum_pad = jnp.pad(cum, (0, pad), constant_values=_HUGE)
    vals = jnp.stack(rows + [cum_pad], axis=0)  # [NUM_ROWS, N_pad]
    # Chunk-major layout so a grid step's buffer is ONE dynamic
    # leading-index DMA ([STREAM_C, 8, 512]); costs one extra pass over the
    # table (~0.5 ms at garden scale), repaid by the removed per-window DMAs.
    vals3 = jnp.swapaxes(vals.reshape(NUM_ROWS, n_chunks, WINDOW), 0, 1)

    j0 = jnp.arange(nw_pad + 1, dtype=jnp.int32) * WINDOW
    j0_eff = jnp.maximum(jnp.minimum(j0, total - 1), 0)
    sw_raw = two_level_left_search(cum_pad, j0_eff + 1).astype(jnp.int32)
    sw_al = (sw_raw[:-1] // ALIGN) * ALIGN  # [nw_pad], 128-aligned
    sw_al = jnp.minimum(sw_al, n_pad - WINDOW)

    # Grid-step buffer start: the step's FIRST window's chunk, clamped so
    # the buffer stays in-table.  512-aligned by construction.
    s_step = (sw_al[0::STREAM_K] // WINDOW) * WINDOW
    s_step = jnp.minimum(s_step, (n_chunks - STREAM_C) * WINDOW)

    off = sw_al - jnp.repeat(s_step, STREAM_K)  # [nw_pad] rows, mult of 128
    c1 = off // WINDOW
    r = off - c1 * WINDOW
    span_ub = sw_raw[1:] - sw_al + 1
    nsrc_tot = -(-(r + span_ub) // GROUP)
    in_buf = c1 <= STREAM_C - 1
    has2 = c1 + 1 <= STREAM_C - 1
    n1 = jnp.where(in_buf, jnp.clip(nsrc_tot, 1, NBLOCKS), 0).astype(jnp.int32)
    n2 = jnp.where(has2, jnp.clip(nsrc_tot - NBLOCKS, 0, NBLOCKS), 0).astype(
        jnp.int32
    )
    c1c = jnp.minimum(c1, STREAM_C - 1).astype(jnp.int32)
    # Serial-refill base: first chunk row NOT covered by the buffered pair;
    # escaped-buffer windows restart from their own (chunk-aligned) row.
    rb = jnp.where(
        in_buf,
        jnp.repeat(s_step, STREAM_K)
        + (c1 + 1 + has2.astype(jnp.int32)) * WINDOW,
        (sw_al // WINDOW) * WINDOW,
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (NUM_ROWS, STREAM_K * WINDOW),
            lambda b, *_: (0, b),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, STREAM_C, NUM_ROWS, WINDOW), jnp.int32),
            pltpu.VMEM((1, NUM_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_stream_kernel, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct(
            (NUM_ROWS, nw_pad * WINDOW), jnp.int32
        ),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(s_step, c1c, n1, n2, rb, total.reshape(1), vals3)

    cols = [out[i, :capacity] for i in range(len(packed_cols))]
    return cols, total


@functools.partial(jax.jit, static_argnames=("capacity", "wide_span"))
def expand_rows(packed_cols, counts, capacity: int, wide_span: bool = False):
    """Monotone fixed-capacity expansion, kernel-backed.

    Equivalent to
    ``jnp.repeat(stack(packed_cols, -1), counts, 0, total_repeat_length=capacity)``
    (with zeros, not garbage, in dead slots).

    Args:
      packed_cols: sequence of <= 7 [N] int32 arrays (the per-gaussian packed
        row, one array per column).
      counts: [N] int32 per-gaussian element counts (0 for culled).
      capacity: static slot capacity E.
      wide_span: static — pipeline TWO source chunks per window
        (unconditional DMA + processing).  Use when counts are thinned
        (mean ~1 element/source row, the prefilter steady regime) so spans
        routinely exceed one 512-row chunk; the default single-chunk
        kernel serial-refills there and more than doubles.

    Returns (cols, total): list of [capacity] int32 expanded columns and the
    [] int32 live total (== cum[-1], unclamped).
    """
    n = counts.shape[0]
    cum = jnp.cumsum(counts, dtype=jnp.int32)  # [N] inclusive
    total = cum[-1] if n > 0 else jnp.int32(0)

    n_pad = max(-(-n // WINDOW) * WINDOW, 2 * WINDOW)
    num_windows = -(-capacity // WINDOW)

    rows = [r.astype(jnp.int32) for r in packed_cols]
    assert len(rows) <= MAX_COLS
    while len(rows) < MAX_COLS:
        rows.append(jnp.zeros((n,), jnp.int32))
    pad = n_pad - n
    rows = [jnp.pad(r, (0, pad)) for r in rows]
    cum_pad = jnp.pad(cum, (0, pad), constant_values=_HUGE)
    vals = jnp.stack(rows + [cum_pad], axis=0)  # [NUM_ROWS, N_pad]

    # Exact first source row per window via a two-level search (the flat
    # searchsorted costs ~log2(N) gather rounds per probe; the coarse pass
    # runs over an N/1024-entry table).  side="right" on integer keys ==
    # side="left" on key+1.  One extra probe bounds the last window's span.
    j0 = jnp.arange(num_windows + 1, dtype=jnp.int32) * WINDOW
    j0_eff = jnp.maximum(jnp.minimum(j0, total - 1), 0)
    sw_raw = two_level_left_search(cum_pad, j0_eff + 1).astype(jnp.int32)
    sw = (sw_raw[:-1] // ALIGN) * ALIGN
    # In-bounds clamp HERE, not (only) in the kernel: the kernel's DMA clamp
    # would shift the chunk's data relative to sw without updating nsrc,
    # breaking the span bound (found empirically: tail windows near n_pad).
    # n_pad - WINDOW is 128-aligned, so alignment is preserved.
    sw = jnp.minimum(sw, n_pad - WINDOW)
    # Source blocks that can hold this window's covering rows: misalignment
    # + span, over-approximated by one row (sw_raw[b+1] >= last covering
    # row).  Up to 2*NBLOCKS blocks ride the two pipelined chunks; beyond
    # -> serial refill path.  The second chunk must not be DMA-clamped
    # (clamping shifts its content relative to sw), so windows whose
    # second chunk would start past n_pad - WINDOW are capped at one chunk
    # — behaviorally identical to the single-chunk kernel there.
    span_ub = sw_raw[1:] - sw + 1
    max_nsrc = MAX_NSRC if wide_span else NBLOCKS
    nsrc = jnp.clip(-(-span_ub // GROUP), 1, max_nsrc).astype(jnp.int32)
    if wide_span:
        nsrc = jnp.where(
            sw + WINDOW <= n_pad - WINDOW,
            nsrc,
            jnp.minimum(nsrc, NBLOCKS),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_windows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (NUM_ROWS, WINDOW), lambda b, *_: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, NUM_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, n_pad=n_pad, wide=wide_span),
        out_shape=jax.ShapeDtypeStruct((NUM_ROWS, num_windows * WINDOW), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(sw, nsrc, total.reshape(1), vals)

    cols = [out[i, :capacity] for i in range(len(packed_cols))]
    return cols, total
