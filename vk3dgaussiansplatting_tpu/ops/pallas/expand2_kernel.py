"""Paired-window monotone expansion — 2 windows per crossbar.

The round-3 expansion kernel (expand_kernel.py) moves 6 value columns + the
cumsum row through every [8, 128] vreg crossbar: 7 of 8 sublanes carry
payload, one window per grid step.  Crossbars are the kernel's budget
(~85 ns per [8, 128] `tpu.dynamic_gather`), and they move all 8 sublanes
whether used or not — so halving the column count does nothing UNLESS the
freed sublanes carry a second window.

This kernel packs the per-gaussian row into 3 columns + cumsum = 4 rows:

    colA = id | w << 23          (id < 2^23; rect width w <= 120 -> 7 bits)
    colB = tile0 | h << 13       (tile0 = y0*gw + x0 < 8160 -> 13 bits;
                                  rect height h <= 68 -> 7 bits)
    colC = depth key             (32 bits, bit-cast through i32)
    row3 = inclusive cumsum      (the compare-count control row)

The per-slot offset needs no column at all: the crossbar gathers the
covering row's CUM value alongside the payload (row 3), and
offset = cum - w*h exactly (counts = w*h by construction).  Slot math then
proceeds as in ops/keygen.py: local = slot - offset, ly = local // w,
lx = local - ly*w, tile = tile0 + ly*gw + lx.

Grid step k serves windows (k, k + nw2) [nw2 = ceil(num_windows / 2)]:
window k's chunk is DMA'd into sublanes 0-3, window k+nw2's into 4-7, and
one `take_along_axis` [8, 128] crossbar with PER-ROW indices gathers both
windows at once — per dst group the block loop runs max(nsrcA, nsrcB)
times instead of nsrcA + nsrcB.  DMA bytes halve too ([4, 512] x2 per pair
vs [8, 512] per window).  The far-pair layout keeps the output unpack a
pair of contiguous slices (no transpose): window w < nw2 lives in out
rows 0-3, w >= nw2 in rows 4-7.

Everything else (exact 128-aligned chunk starts from a two-level search,
scalar-prefetched per-window source-block counts, the rare multi-chunk
refill loop) mirrors expand_kernel.py; results are bit-identical to
`jnp.repeat` (tests/test_expand2.py).

Reference analogue: the InitSortList atomicAdd slot allocation
(InitSortList.comp:129-150), re-derived as a prefix-sum plan.
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

WINDOW = 512
GROUP = 128
NBLOCKS = WINDOW // GROUP  # 4
HALF = 4  # rows per window half: 3 value cols + cumsum
CUM = 3  # cumsum row within a half
ALIGN = 128

_HUGE = 2**31 - 1


def _count_half(vbuf, cum_row, j_eff, nsrc):
    """cnt[j] = #{rows i in this half's chunk : cum[i] <= j_eff[j]}."""
    cnt = jnp.zeros((1, WINDOW), jnp.int32)
    for h in range(NBLOCKS):
        col = vbuf[cum_row : cum_row + 1, h * GROUP : (h + 1) * GROUP].T
        blk = jnp.sum(
            (col <= j_eff).astype(jnp.int32), axis=0, keepdims=True
        )
        cnt = cnt + jnp.where(jnp.int32(h) < nsrc, blk, 0)
    return cnt


def _gather_pair(vals_buf, loc_a, fnd_a, loc_b, fnd_b, nsrc_a, nsrc_b):
    """Expand one chunk-pair: rows 0-3 <- window A, rows 4-7 <- window B.

    vals_buf: [8, WINDOW] (sublanes 0-3 = A's chunk, 4-7 = B's chunk).
    loc_*:    [1, WINDOW] i32 covering-row index within the half's chunk.
    fnd_*:    [1, WINDOW] i32 0/1 — lanes whose covering row is here.
              (i32, not bool: Mosaic cannot lower vector selects on i1 —
              "Unsupported target bitwidth for truncation", observed
              server-side 2026-08-21.)
    Returns [8, WINDOW] i32 with unfound lanes zero.
    """
    row4 = jax.lax.broadcasted_iota(jnp.int32, (8, GROUP), 0) < 4
    out_groups = []
    for g in range(NBLOCKS):
        sl = slice(g * GROUP, (g + 1) * GROUP)
        acc_g = jnp.zeros((8, GROUP), jnp.int32)
        fnd_g = jnp.where(
            row4,
            jnp.broadcast_to(fnd_a[:, sl], (8, GROUP)),
            jnp.broadcast_to(fnd_b[:, sl], (8, GROUP)),
        )
        idx_g = jnp.where(
            row4,
            jnp.broadcast_to(loc_a[:, sl], (8, GROUP)),
            jnp.broadcast_to(loc_b[:, sl], (8, GROUP)),
        )
        nmax = jnp.maximum(nsrc_a, nsrc_b)
        for h in range(NBLOCKS):
            lidx = idx_g - jnp.int32(h * GROUP)
            in_blk = (lidx >= 0) & (lidx < GROUP)
            # each half only consumes blocks below its own nsrc (i32
            # select + compare, for the same i1 reason)
            half_live = (
                jnp.where(
                    row4,
                    (jnp.int32(h) < nsrc_a).astype(jnp.int32),
                    (jnp.int32(h) < nsrc_b).astype(jnp.int32),
                )
                > 0
            )
            valid = (fnd_g > 0) & in_blk & half_live
            lidx_c = jnp.clip(lidx, 0, GROUP - 1)
            src = vals_buf[:, h * GROUP : (h + 1) * GROUP]
            gth = jnp.take_along_axis(src, lidx_c, axis=1)
            picked = jnp.where(valid, gth, acc_g)
            # skip blocks neither half can reach (crossbar budget)
            acc_g = jnp.where(jnp.int32(h) < nmax, picked, acc_g)
        out_groups.append(acc_g)
    return jnp.concatenate(out_groups, axis=1)


def _expand2_kernel(
    sw_ref,  # [2*nw2] i32: 128-aligned first source row per window
    nsrc_ref,  # [2*nw2] i32: source blocks covering each window's span
    total_ref,  # [1] i32 live element count
    vals_hbm,  # [HALF, n_pad] i32 packed source rows (row 3 = cumsum)
    out_ref,  # [8, WINDOW] block at (0, k)
    vals_buf,  # [2, 8, WINDOW] VMEM scratch (double-buffered pairs)
    sems,  # DMA semaphores [2, 2]
    *,
    n_pad: int,
    nw2: int,
):
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    slot = lax.rem(k, 2)
    max_start = n_pad - WINDOW
    total = total_ref[0]

    def dma(buf_slot, half, row0):
        row0 = jnp.minimum(row0, max_start)
        row0 = pl.multiple_of(row0, ALIGN)
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(row0, WINDOW)],
            vals_buf.at[buf_slot, pl.ds(half * HALF, HALF)],
            sems.at[buf_slot, half],
        )

    def live_a(kk):
        return kk * jnp.int32(WINDOW) < total

    def live_b(kk):
        return (kk + jnp.int32(nw2)) * jnp.int32(WINDOW) < total

    @pl.when((k == 0) & live_a(k))
    def _():
        dma(0, 0, sw_ref[0]).start()

    @pl.when((k == 0) & live_b(k))
    def _():
        dma(0, 1, sw_ref[nw2]).start()

    @pl.when((k + 1 < nk) & live_a(k + 1))
    def _():
        dma(1 - slot, 0, sw_ref[k + 1]).start()

    @pl.when((k + 1 < nk) & live_b(k + 1))
    def _():
        dma(1 - slot, 1, sw_ref[k + 1 + nw2]).start()

    la = live_a(k)
    lb = live_b(k)

    @pl.when(jnp.logical_not(la))
    def _():
        # Window A dead implies B dead too (B is the later half of slot
        # space); the caller masks these slots to sentinels.
        out_ref[:, :] = jnp.zeros((8, WINDOW), jnp.int32)

    @pl.when(la)
    def _():
        dma(slot, 0, sw_ref[k]).wait()

        @pl.when(lb)
        def _():
            dma(slot, 1, sw_ref[k + nw2]).wait()

        @pl.when(jnp.logical_not(lb))
        def _():
            # B half dead: zero its output rows; A still computes.
            out_ref[pl.ds(HALF, HALF), :] = jnp.zeros(
                (HALF, WINDOW), jnp.int32
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
        j_a = k * jnp.int32(WINDOW) + lane
        j_b = (k + jnp.int32(nw2)) * jnp.int32(WINDOW) + lane
        ja_eff = jnp.maximum(jnp.minimum(j_a, total - 1), 0)
        jb_eff = jnp.maximum(jnp.minimum(j_b, total - 1), 0)

        def process(vbuf, sa, sb, acc, na, nb):
            cnt_a = _count_half(vbuf[0:HALF], CUM, ja_eff, na)
            cnt_b = _count_half(vbuf[HALF : 2 * HALF], CUM, jb_eff, nb)
            fnd_a = (
                (sa > 0) & (cnt_a < na * jnp.int32(GROUP))
            ).astype(jnp.int32)
            fnd_b = (
                (sb > 0) & (cnt_b < nb * jnp.int32(GROUP)) & lb
            ).astype(jnp.int32)
            gathered = _gather_pair(
                vbuf, cnt_a, fnd_a, cnt_b, fnd_b, na, nb
            )
            acc = acc + gathered
            sa = jnp.where(cnt_a >= na * jnp.int32(GROUP), sa, 0)
            sb = jnp.where(cnt_b >= nb * jnp.int32(GROUP), sb, 0)
            return sa, sb, acc

        ones = jnp.ones((1, WINDOW), jnp.int32)
        acc0 = jnp.zeros((8, WINDOW), jnp.int32)
        sa1, sb1, acc1 = process(
            vals_buf[slot], ones, ones * lb.astype(jnp.int32), acc0,
            nsrc_ref[k], nsrc_ref[k + nw2],
        )

        # Rare refill: a window's span exceeds one chunk.  Each half
        # refills its own chunk stream; both are processed together.
        def cond(carry):
            ca, cb, sa, sb, _ = carry
            more_a = (jnp.max(sa) > 0) & (
                sw_ref[k] + ca * jnp.int32(WINDOW) <= max_start
            )
            more_b = (jnp.max(sb) > 0) & (
                sw_ref[k + nw2] + cb * jnp.int32(WINDOW) <= max_start
            )
            return more_a | more_b

        def body(carry):
            ca, cb, sa, sb, acc = carry
            need_a = (jnp.max(sa) > 0) & (
                sw_ref[k] + ca * jnp.int32(WINDOW) <= max_start
            )
            need_b = (jnp.max(sb) > 0) & (
                sw_ref[k + nw2] + cb * jnp.int32(WINDOW) <= max_start
            )

            @pl.when(need_a)
            def _():
                d = dma(slot, 0, sw_ref[k] + ca * jnp.int32(WINDOW))
                d.start()
                d.wait()

            @pl.when(need_b)
            def _():
                d = dma(slot, 1, sw_ref[k + nw2] + cb * jnp.int32(WINDOW))
                d.start()
                d.wait()

            # a half whose chunk was not refilled must not re-match: zero
            # its searching mask for this round
            sa_r = jnp.where(need_a, sa, 0)
            sb_r = jnp.where(need_b, sb, 0)
            sa2, sb2, acc = process(
                vals_buf[slot], sa_r, sb_r, acc,
                jnp.int32(NBLOCKS), jnp.int32(NBLOCKS),
            )
            # halves that skipped this round keep searching
            sa3 = jnp.where(need_a, sa2, sa)
            sb3 = jnp.where(need_b, sb2, sb)
            return (
                ca + need_a.astype(jnp.int32),
                cb + need_b.astype(jnp.int32),
                sa3,
                sb3,
                acc,
            )

        _, _, _, _, acc = lax.while_loop(
            cond, body, (jnp.int32(1), jnp.int32(1), sa1, sb1, acc1)
        )
        out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("capacity",))
def expand_rows2(packed_cols, counts, capacity: int):
    """Paired-window expansion: equivalent to expand_kernel.expand_rows for
    up to 3 value columns, also returning the gathered cumsum column.

    Args:
      packed_cols: sequence of <= 3 [N] int32 arrays.
      counts: [N] int32 per-gaussian element counts.
      capacity: static slot capacity E.

    Returns (cols, cum_col, total): the expanded value columns, the
    covering row's INCLUSIVE cumsum per slot (zero in dead slots), and the
    [] int32 live total.
    """
    n = counts.shape[0]
    cum = jnp.cumsum(counts, dtype=jnp.int32)
    total = cum[-1] if n > 0 else jnp.int32(0)

    n_pad = max(-(-n // WINDOW) * WINDOW, WINDOW)
    num_windows = -(-capacity // WINDOW)
    nw2 = -(-num_windows // 2)

    rows = [r.astype(jnp.int32) for r in packed_cols]
    assert len(rows) <= HALF - 1
    while len(rows) < HALF - 1:
        rows.append(jnp.zeros((n,), jnp.int32))
    pad = n_pad - n
    rows = [jnp.pad(r, (0, pad)) for r in rows]
    cum_pad = jnp.pad(cum, (0, pad), constant_values=_HUGE)
    vals = jnp.stack(rows + [cum_pad], axis=0)  # [HALF, n_pad]

    # Exact first source row per window (see expand_kernel.expand_rows);
    # padded to the even window count so sw[k + nw2] is always in bounds.
    j0 = jnp.arange(2 * nw2 + 1, dtype=jnp.int32) * WINDOW
    j0_eff = jnp.maximum(jnp.minimum(j0, total - 1), 0)
    sw_raw = two_level_left_search(cum_pad, j0_eff + 1).astype(jnp.int32)
    sw = (sw_raw[:-1] // ALIGN) * ALIGN
    sw = jnp.minimum(sw, n_pad - WINDOW)
    span_ub = sw_raw[1:] - sw + 1
    nsrc = jnp.clip(-(-span_ub // GROUP), 1, NBLOCKS).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nw2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, WINDOW), lambda k, *_: (0, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, WINDOW), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand2_kernel, n_pad=n_pad, nw2=nw2),
        out_shape=jax.ShapeDtypeStruct((8, nw2 * WINDOW), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(sw, nsrc, total.reshape(1), vals)

    # window w < nw2 -> rows 0-3; w >= nw2 -> rows 4-7 (no transpose)
    cols = [
        jnp.concatenate([out[i], out[HALF + i]])[:capacity]
        for i in range(len(packed_cols))
    ]
    cum_col = jnp.concatenate([out[CUM], out[HALF + CUM]])[:capacity]
    return cols, cum_col, total
