"""Pallas monotone-expansion kernel: bit-parity with jnp.repeat.

The kernel (ops/pallas/expand_kernel.py) replaces the expansion step of
keygen (the reference's atomicAdd allocation, InitSortList.comp:129-150).
Every case checks exact equality of the expanded columns on live slots
against the jnp.repeat formulation, including the u32 depth-bit round trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.ops import keygen
from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel
from vk3dgaussiansplatting_tpu.scenes.synthetic import (
    SimpleTestGaussiansScene,
    TestSortScene,
)


def _reference_expand(cols_np, counts_np, capacity):
    packed = np.stack(cols_np, axis=-1).astype(np.int32)
    live = int(min(counts_np.sum(), capacity))
    out = np.zeros((capacity, packed.shape[1]), np.int32)
    out[:live] = np.repeat(packed, counts_np, axis=0)[:live]
    return out, live


def _run_case(counts_np, capacity, extra_cols=None, seed=0):
    rng = np.random.default_rng(seed)
    n = counts_np.shape[0]
    cols_np = [np.arange(n, dtype=np.int32)]
    if extra_cols is None:
        cols_np.append(rng.integers(-(2**31), 2**31, size=n).astype(np.int32))
    else:
        cols_np.extend(extra_cols)
    want, live = _reference_expand(cols_np, counts_np, capacity)
    cols, total = expand_kernel.expand_rows(
        [jnp.asarray(c) for c in cols_np], jnp.asarray(counts_np), capacity
    )
    assert int(total) == int(counts_np.sum())
    got = np.stack([np.asarray(c) for c in cols], axis=-1)
    np.testing.assert_array_equal(got[:live], want[:live])


def test_random_counts_with_culls():
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 9, size=700).astype(np.int32)
    counts[rng.random(700) < 0.4] = 0  # culled gaussians interleaved
    _run_case(counts, capacity=int(counts.sum()) + 300)


def test_long_culled_run_spans_chunks():
    # A >1024-row fully-culled gap forces the in-kernel while_loop to refill
    # chunks before finding the covering row.
    counts = np.ones(3000, np.int32)
    counts[100:2500] = 0
    _run_case(counts, capacity=1024)


def test_saturated_span_single_tile_gaussians():
    # >512 one-element gaussians per window: every window's span covers more
    # than one chunk even with no culls.
    counts = np.ones(4000, np.int32)
    _run_case(counts, capacity=4096)


def test_overflow_truncation():
    counts = np.full(300, 11, np.int32)  # total 3300 > capacity
    _run_case(counts, capacity=1536)


def test_dead_tail_and_unaligned_capacity():
    counts = np.array([5, 0, 3, 0, 0, 2] * 10, np.int32)
    _run_case(counts, capacity=1000)  # non-multiple of the window size


def test_all_culled():
    counts = np.zeros(600, np.int32)
    cols, total = expand_kernel.expand_rows(
        [jnp.arange(600, dtype=jnp.int32)], jnp.asarray(counts), 512
    )
    assert int(total) == 0  # nothing live; caller masks every slot


def test_u32_depth_bits_survive():
    # Depth keys >= 2^31 are carried as their i32 bit pattern; the gather
    # must move bits, not values.
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 4, size=400).astype(np.int32)
    depth_u32 = rng.integers(0, 2**32, size=400, dtype=np.uint64).astype(np.uint32)
    depth_i32 = depth_u32.view(np.int32)
    _run_case(counts, capacity=int(counts.sum()) + 128, extra_cols=[depth_i32])


@pytest.mark.parametrize("scene_cls", [SimpleTestGaussiansScene, TestSortScene])
def test_keygen_pallas_expansion_matches_repeat(scene_cls):
    """Full keygen pass: pallas expansion == repeat expansion, bit for bit."""
    base = RenderConfig(
        width=128,
        height=128,
        capacity_slack_per_tile=32,
        sort_algorithm=SortAlgorithm.XLA_SORT,
    )
    scene = scene_cls(aspect=base.aspect)
    scene.init()
    scene.camera.set_aspect(base.aspect)
    table = jax.tree.map(jnp.asarray, scene.gaussians())
    view, proj = scene.camera.matrices()
    capacity = base.sort_capacity(int(table.position.shape[0]))
    args = (
        table,
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(scene.camera.position),
    )
    import dataclasses

    el_rep, _ = keygen.generate_sort_elements(
        *args, dataclasses.replace(base, expansion_method="repeat"), capacity
    )
    for method in ("pallas", "stream"):
        el_pl, _ = keygen.generate_sort_elements(
            *args, dataclasses.replace(base, expansion_method=method), capacity
        )
        np.testing.assert_array_equal(
            np.asarray(el_rep.tile), np.asarray(el_pl.tile)
        )
        np.testing.assert_array_equal(
            np.asarray(el_rep.depth), np.asarray(el_pl.depth)
        )
        np.testing.assert_array_equal(
            np.asarray(el_rep.index), np.asarray(el_pl.index)
        )
        assert int(el_rep.count) == int(el_pl.count)


def test_prefilter_thinned_counts_span_regimes():
    """Half-zero counts at mean ~1 live element/source row (the prefilter
    steady regime that made spans exceed one 512-row chunk): windows span
    most of a CHUNK and some exceed it (refill path), bit-parity held."""
    rng = np.random.default_rng(11)
    counts = rng.integers(1, 4, size=20_000).astype(np.int32)
    counts[rng.random(20_000) < 0.55] = 0
    _run_case(counts, capacity=int(counts.sum()) + 512)


def test_wide_span_variant_parity():
    """wide_span=True (two unconditional pipelined chunks) is bit-equal to
    the default kernel across span regimes incl. the serial-refill tail."""
    rng = np.random.default_rng(13)
    for counts, cap in (
        (rng.integers(0, 3, 9000).astype(np.int32), 8192),
        (np.ones(6000, np.int32), 4096),  # dense + overflow
    ):
        counts = counts.copy()
        counts[rng.random(len(counts)) < 0.5] = 0
        cols_np = [np.arange(len(counts), dtype=np.int32),
                   rng.integers(-(2**31), 2**31, len(counts)).astype(np.int32)]
        want, live = _reference_expand(cols_np, counts, cap)
        cols, total = expand_kernel.expand_rows(
            [jnp.asarray(c) for c in cols_np], jnp.asarray(counts), cap,
            wide_span=True,
        )
        got = np.stack([np.asarray(c) for c in cols], axis=-1)
        np.testing.assert_array_equal(got[:live], want[:live])
        assert int(total) == int(counts.sum())


def test_tail_window_span_crossing_pad_boundary():
    """r4 regression: a window whose span crosses n_pad - WINDOW used to
    orphan its tail covering rows (the refill refused clamped chunks).
    Both kernel variants must cover the table's final rows."""
    rng = np.random.default_rng(13)
    counts = rng.integers(0, 3, 9000).astype(np.int32)
    counts[rng.random(9000) < 0.5] = 0
    cols_np = [np.arange(9000, dtype=np.int32),
               rng.integers(-(2**31), 2**31, 9000).astype(np.int32)]
    want, live = _reference_expand(cols_np, counts, 8192)
    for wide in (False, True):
        cols, total = expand_kernel.expand_rows(
            [jnp.asarray(c) for c in cols_np], jnp.asarray(counts), 8192,
            wide_span=wide,
        )
        got = np.stack([np.asarray(c) for c in cols], axis=-1)
        np.testing.assert_array_equal(got[:live], want[:live])


def _run_streamed(counts_np, capacity, seed=0, n_cols=3):
    rng = np.random.default_rng(seed)
    n = counts_np.shape[0]
    cols_np = [np.arange(n, dtype=np.int32)]
    for _ in range(n_cols - 1):
        cols_np.append(rng.integers(-(2**31), 2**31, size=n).astype(np.int32))
    want, live = _reference_expand(cols_np, counts_np, capacity)
    cols, total = expand_kernel.expand_rows_streamed(
        [jnp.asarray(c) for c in cols_np], jnp.asarray(counts_np), capacity
    )
    assert int(total) == int(counts_np.sum())
    got = np.stack([np.asarray(c) for c in cols], axis=-1)
    np.testing.assert_array_equal(got[:live], want[:live])


def test_streamed_dense_regime():
    # counts mean ~2.4 (the unfiltered garden regime): K windows span far
    # less than the step buffer.
    rng = np.random.default_rng(21)
    counts = rng.poisson(2.4, size=30_000).astype(np.int32)
    counts[rng.random(30_000) < 0.3] = 0
    _run_streamed(counts, capacity=int(counts.sum()) + 700)


def test_streamed_thinned_regime():
    # mean ~1 live element/source row (prefilter steady): window spans
    # routinely exceed one chunk; some step tails escape the buffer.
    rng = np.random.default_rng(22)
    counts = rng.integers(1, 4, size=40_000).astype(np.int32)
    counts[rng.random(40_000) < 0.55] = 0
    _run_streamed(counts, capacity=int(counts.sum()) + 512)


def test_streamed_long_culled_run_refill():
    # A >STREAM_C-chunk fully-culled gap: covering rows escape the step
    # buffer entirely -> serial refill from the window's own chunk.
    counts = np.ones(20_000, np.int32)
    counts[100:15_000] = 0
    _run_streamed(counts, capacity=5120)


def test_streamed_huge_single_gaussians():
    # A few gaussians with thousands of elements: many consecutive windows
    # share one covering row; spans collapse.
    rng = np.random.default_rng(23)
    counts = rng.integers(0, 2, size=8000).astype(np.int32)
    counts[rng.integers(0, 8000, 30)] = rng.integers(
        1500, 6000, 30
    ).astype(np.int32)
    _run_streamed(counts, capacity=20_480)


def test_streamed_overflow_and_unaligned_capacity():
    counts = np.full(3000, 7, np.int32)
    _run_streamed(counts, capacity=9000)  # truncating, non-multiple of K*W


def test_streamed_small_table_and_all_culled():
    _run_streamed(np.zeros(600, np.int32), capacity=512)
    counts = np.array([5, 0, 3, 0, 0, 2] * 10, np.int32)
    _run_streamed(counts, capacity=1000)


def test_streamed_tail_window_crossing_pad_boundary():
    rng = np.random.default_rng(24)
    counts = rng.integers(0, 3, size=9000).astype(np.int32)
    counts[rng.random(9000) < 0.5] = 0
    _run_streamed(counts, capacity=8192)


def test_streamed_u32_depth_bits_survive():
    rng = np.random.default_rng(25)
    counts = rng.integers(0, 4, size=4000).astype(np.int32)
    _run_streamed(counts, capacity=int(counts.sum()) + 128, n_cols=6)
