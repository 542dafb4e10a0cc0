"""Pallas TPU monotone-expansion kernel — the InitSortList element allocation.

Replaces the `jnp.repeat(packed, counts, total_repeat_length=capacity)` step
of ops/keygen.py (the reference's atomicAdd slot allocation,
InitSortList.comp:129-150).  XLA lowers that repeat to a scatter (indicator
build) plus a per-row gather, both pathological on this TPU stack (scatter
~100 ms at 8M; gather ~6.5 ns/row regardless of width — ~190 ms total at
Garden-30k scale).  This kernel exploits the *monotone* structure the repeat
hides: slot j's source row r(j) = #{i : cum_i <= j} is non-decreasing, so a
window of W consecutive slots draws from a narrow band of source rows.

Per 512-slot window (one grid step):

  1. the window's first source row s_w comes from a tiny XLA-side
     `searchsorted` over the inclusive cumsum (one probe per window);
  2. one [8, 512] slice of the packed source table is DMA'd to VMEM — 7 value
     rows plus the inclusive cumsum as row 7 (the next window's slice is
     prefetched double-buffered);
  3. the covering row of each slot is the compare-count
     cnt[j] = sum_i (cum[i] <= j) over the chunk, computed in TWO levels:
     a coarse count over the 64 group-of-8 last-values ([64 x 512] compare)
     plus a fine count inside the covering group (a 128-lane crossbar gather
     of the group's 8 cum values + [8 x 512] compare).  The group layout
     cum_g[k, g] = cum[8g + k] is precomputed OUTSIDE the kernel (XLA
     reshape) and shipped as a second [8, N_pad] input — in-kernel strided
     slices / 1D->2D shape casts fail the server-side Mosaic compiler
     (observed 2026-08-20), precomputed layouts avoid them entirely.  This
     replaces the earlier flat [512 x 512] compare (~4x the vector work);
  4. the expansion itself is Mosaic's vreg lane-crossbar
     (`tpu.dynamic_gather`, reached via `jnp.take_along_axis(x, idx, axis=1)`
     with idx.shape == x.shape): 4 slot lane-groups x 4 source lane-groups
     of [8, 128] gathers + selects, moving all 8 rows per op.  The gather
     moves raw i32 bits — the expansion is exact by construction (verified
     bit-for-bit against jnp.repeat in tests/test_expand.py);
  5. a `while_loop` refills further 512-row chunks for the rare window whose
     source span exceeds one chunk (e.g. long culled runs, or >512 tiny
     one-tile gaussians per window).

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

from .common import interpret_mode

# Slots per window == source rows per chunk.  One lane-group is 128; the
# vreg crossbar gathers within 128 lanes, so both are decomposed into
# 512/128 = 4 static groups.
WINDOW = 512
GROUP = 128
NUM_ROWS = 8  # 7 value rows + the cumsum control row
CUM_ROW = NUM_ROWS - 1
MAX_COLS = NUM_ROWS - 1
GROUP_OF = 8  # cum rows per coarse group (two-level count)
GROUP_ROWS = 8  # sublane rows of the precomputed group layout

_HUGE = 2**31 - 1


def _gather_groups(vals_buf, local, found):
    """Expand one chunk: out[:, j] = vals_buf[:, local[j]] where found[j].

    vals_buf: [NUM_ROWS, WINDOW] i32 chunk of source rows (lanes = rows).
    local:    [1, WINDOW] i32 covering-row index within the chunk.
    found:    [1, WINDOW] bool — lanes whose covering row is in this chunk.
    Returns [NUM_ROWS, WINDOW] i32 with unfound lanes zero.
    """
    out_groups = []
    for g in range(WINDOW // GROUP):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        idx_g = local[:, sl]  # [1, GROUP]
        fnd_g = jnp.broadcast_to(found[:, sl], (NUM_ROWS, GROUP))
        acc_g = jnp.zeros((NUM_ROWS, GROUP), jnp.int32)
        for h in range(WINDOW // GROUP):
            lidx = idx_g - jnp.int32(h * GROUP)
            valid = fnd_g & jnp.broadcast_to(
                (lidx >= 0) & (lidx < GROUP), (NUM_ROWS, GROUP)
            )
            lidx_c = jnp.broadcast_to(
                jnp.clip(lidx, 0, GROUP - 1), (NUM_ROWS, GROUP)
            )
            src = vals_buf[:, h * GROUP : (h + 1) * GROUP]
            gth = jnp.take_along_axis(src, lidx_c, axis=1)
            acc_g = jnp.where(valid, gth, acc_g)
        out_groups.append(acc_g)
    return jnp.concatenate(out_groups, axis=1)


def _count_two_level(vbuf, gbuf, j_eff):
    """cnt[j] = #{rows i in chunk : cum[i] <= j_eff[j]}, two-level.

    vbuf: [NUM_ROWS, W] value chunk (row CUM_ROW = flat cumsum).
    gbuf: [GROUP_ROWS, W] group layout: gbuf[k, g] = cum[8g + k] for
          g < W//8 (lanes beyond W//8 hold _HUGE padding).
    Coarse: count groups whose LAST value (gbuf row 7) <= j — one
    [64 x W] compare.  Fine: crossbar-gather the covering group's 8 cum
    values (indices < 64 are group-0-local, the proven [8,128] pattern)
    and count within — one [8 x W] compare.  `searching`-free; returns
    [1, W] i32.
    """
    ngroups = WINDOW // GROUP_OF  # 64
    # Coarse: group-last values as sublanes.  gbuf[7, 0:128] holds
    # cum[8g+7] for g<64 (lanes 64-127 _HUGE); transpose+slice to [64, 1].
    last_lane = gbuf[GROUP_ROWS - 1 : GROUP_ROWS, 0:GROUP].T  # [128, 1]
    last_col = last_lane[0:ngroups, :]  # [64, 1]
    coarse = jnp.sum(
        (last_col <= j_eff).astype(jnp.int32), axis=0, keepdims=True
    )  # [1, W] in [0, 64]
    coarse_c = jnp.minimum(coarse, ngroups - 1)

    # Fine: gather the covering group's 8 cum values per slot.  Source is
    # the group-0 lane slice [8, 128] (indices < 64), destination decomposed
    # into 128-lane groups exactly like _gather_groups.
    src = gbuf[:, 0:GROUP]  # [8, 128]
    fine_parts = []
    for g in range(WINDOW // GROUP):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        idx_g = jnp.broadcast_to(coarse_c[:, sl], (GROUP_ROWS, GROUP))
        gath = jnp.take_along_axis(src, idx_g, axis=1)  # [8, 128]
        fine_parts.append(
            jnp.sum(
                (gath <= j_eff[:, sl]).astype(jnp.int32),
                axis=0,
                keepdims=True,
            )
        )
    fine = jnp.concatenate(fine_parts, axis=1)  # [1, W]
    return jnp.where(
        coarse >= ngroups,
        jnp.int32(WINDOW),
        coarse * jnp.int32(GROUP_OF) + fine,
    )


def _expand_kernel(
    sw_ref,  # [B] i32 scalar-prefetch: aligned first source row per window
    total_ref,  # [1] i32 scalar-prefetch: live element count (cum[-1])
    vals_hbm,  # [NUM_ROWS, N_pad] i32 packed source rows (row 7 = cumsum)
    cumg_hbm,  # [GROUP_ROWS, N_pad] i32 per-chunk group layout of the cumsum
    out_ref,  # [NUM_ROWS, WINDOW] block at (0, b)
    vals_buf,  # [2, NUM_ROWS, WINDOW] VMEM scratch
    cumg_buf,  # [2, GROUP_ROWS, WINDOW] VMEM scratch
    sems,  # DMA semaphores [2]
    gsems,  # DMA semaphores [2] for the group-layout chunk
    *,
    n_pad: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = lax.rem(b, 2)
    max_start = n_pad - WINDOW
    total = total_ref[0]

    def dma(buf_slot, row0):
        row0 = jnp.minimum(row0, max_start)
        row0 = pl.multiple_of(row0, WINDOW)
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(row0, WINDOW)],
            vals_buf.at[buf_slot],
            sems.at[buf_slot],
        )

    def dma_g(buf_slot, row0):
        row0 = jnp.minimum(row0, max_start)
        row0 = pl.multiple_of(row0, WINDOW)
        return pltpu.make_async_copy(
            cumg_hbm.at[:, pl.ds(row0, WINDOW)],
            cumg_buf.at[buf_slot],
            gsems.at[buf_slot],
        )

    # Windows are live iff their first slot is below the live total;
    # liveness is monotone in b, so dead windows never interleave live ones.
    live_w = b * jnp.int32(WINDOW) < total

    @pl.when((b == 0) & live_w)
    def _():
        dma(0, sw_ref[0]).start()
        dma_g(0, sw_ref[0]).start()

    @pl.when((b + 1 < nb) & ((b + 1) * jnp.int32(WINDOW) < total))
    def _():
        dma(1 - slot, sw_ref[b + 1]).start()
        dma_g(1 - slot, sw_ref[b + 1]).start()

    @pl.when(jnp.logical_not(live_w))
    def _():
        # Fully-dead window (overflow-drop tail): the caller masks these
        # slots to sentinels; skip the DMA + count machinery entirely.
        out_ref[:, :] = jnp.zeros((NUM_ROWS, WINDOW), jnp.int32)

    @pl.when(live_w)
    def _():
        dma(slot, sw_ref[b]).wait()
        dma_g(slot, sw_ref[b]).wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
        j = b * jnp.int32(WINDOW) + lane
        j_eff = jnp.maximum(jnp.minimum(j, total - 1), 0)  # [1, W]

        def process_chunk(vbuf, gbuf, searching, acc):
            # `searching` is an i32 0/1 mask: Mosaic cannot carry i1
            # vectors through `lax.while_loop` (scf.yield legalization
            # fails on vpad'd i1).
            cnt = _count_two_level(vbuf, gbuf, j_eff)
            found_here = (searching > 0) & (cnt < WINDOW)
            gathered = _gather_groups(vbuf, cnt, found_here)
            acc = acc + gathered  # unfound lanes contribute 0
            searching = jnp.where(cnt >= WINDOW, searching, 0)
            return searching, acc

        searching0 = jnp.ones((1, WINDOW), jnp.int32)
        acc0 = jnp.zeros((NUM_ROWS, WINDOW), jnp.int32)
        searching1, acc1 = process_chunk(
            vals_buf[slot], cumg_buf[slot], searching0, acc0
        )

        # Rare slow path: the window's span exceeds one chunk (long culled
        # runs or >512 single-tile gaussians per window).  Refill the same
        # buffer slot — the next window's prefetch lives in the other slot.
        def cond(carry):
            c, searching, _ = carry
            row0 = sw_ref[b] + c * jnp.int32(WINDOW)
            return (jnp.max(searching) > 0) & (row0 <= max_start)

        def body(carry):
            c, searching, acc = carry
            row0 = sw_ref[b] + c * jnp.int32(WINDOW)
            d = dma(slot, row0)
            dg = dma_g(slot, row0)
            d.start()
            dg.start()
            d.wait()
            dg.wait()
            searching, acc = process_chunk(
                vals_buf[slot], cumg_buf[slot], searching, acc
            )
            return c + 1, searching, acc

        _, _, acc = lax.while_loop(
            cond, body, (jnp.int32(1), searching1, acc1)
        )
        out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("capacity",))
def expand_rows(packed_cols, counts, capacity: int):
    """Monotone fixed-capacity expansion, kernel-backed.

    Equivalent to
    ``jnp.repeat(stack(packed_cols, -1), counts, 0, total_repeat_length=capacity)``
    (with zeros, not garbage, in dead slots).

    Args:
      packed_cols: sequence of <= 7 [N] int32 arrays (the per-gaussian packed
        row, one array per column).
      counts: [N] int32 per-gaussian element counts (0 for culled).
      capacity: static slot capacity E.

    Returns (cols, total): list of [capacity] int32 expanded columns and the
    [] int32 live total (== cum[-1], unclamped).
    """
    n = counts.shape[0]
    cum = jnp.cumsum(counts, dtype=jnp.int32)  # [N] inclusive
    total = cum[-1] if n > 0 else jnp.int32(0)

    n_pad = max(-(-n // WINDOW) * WINDOW, WINDOW)
    num_windows = -(-capacity // WINDOW)

    rows = [r.astype(jnp.int32) for r in packed_cols]
    assert len(rows) <= MAX_COLS
    while len(rows) < MAX_COLS:
        rows.append(jnp.zeros((n,), jnp.int32))
    pad = n_pad - n
    rows = [jnp.pad(r, (0, pad)) for r in rows]
    cum_pad = jnp.pad(cum, (0, pad), constant_values=_HUGE)
    vals = jnp.stack(rows + [cum_pad], axis=0)  # [NUM_ROWS, N_pad]

    # Per-chunk group layout for the kernel's two-level count:
    # cumg[k, 512c + g] = cum[512c + 8g + k] for g < 64; lanes 64-511 of
    # each chunk hold _HUGE.  Built here with XLA reshapes (in-kernel shape
    # casts fail the server-side Mosaic compiler).
    nchunks = n_pad // WINDOW
    cum_g = cum_pad.reshape(nchunks, WINDOW // GROUP_OF, GROUP_OF)
    cum_g = cum_g.transpose(0, 2, 1)  # [C, 8, 64]
    cum_g = jnp.pad(
        cum_g,
        ((0, 0), (0, 0), (0, WINDOW - WINDOW // GROUP_OF)),
        constant_values=_HUGE,
    )  # [C, 8, 512]
    cumg = cum_g.transpose(1, 0, 2).reshape(GROUP_ROWS, n_pad)

    # First source row per window, aligned down to the chunk size.  Windows
    # past the live total clamp their probe so the kernel never scans the
    # culled tail.
    j0 = jnp.arange(num_windows, dtype=jnp.int32) * WINDOW
    j0_eff = jnp.maximum(jnp.minimum(j0, total - 1), 0)
    sw = jnp.searchsorted(cum_pad, j0_eff, side="right").astype(jnp.int32)
    sw = (sw // WINDOW) * WINDOW

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (NUM_ROWS, WINDOW), lambda b, *_: (0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, WINDOW), jnp.int32),
            pltpu.VMEM((2, GROUP_ROWS, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, n_pad=n_pad),
        out_shape=jax.ShapeDtypeStruct((NUM_ROWS, num_windows * WINDOW), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(sw, total.reshape(1), vals, cumg)

    cols = [out[i, :capacity] for i in range(len(packed_cols))]
    return cols, total
