"""Paired-window expansion kernel (ops/pallas/expand2_kernel.py):
bit-parity with jnp.repeat, including the gathered-cumsum column that
replaces the offset column, and full-keygen parity via method "pallas2".
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.ops import keygen
from vk3dgaussiansplatting_tpu.ops.pallas import expand2_kernel
from vk3dgaussiansplatting_tpu.scenes.synthetic import (
    SimpleTestGaussiansScene,
    TestSortScene,
)


def _reference(cols_np, counts_np, capacity):
    packed = np.stack(cols_np, axis=-1).astype(np.int32)
    live = int(min(counts_np.sum(), capacity))
    out = np.zeros((capacity, packed.shape[1]), np.int32)
    out[:live] = np.repeat(packed, counts_np, axis=0)[:live]
    cum = np.cumsum(counts_np).astype(np.int32)
    cum_e = np.zeros((capacity,), np.int32)
    cum_e[:live] = np.repeat(cum, counts_np)[:live]
    return out, cum_e, live


def _run_case(counts_np, capacity, seed=0, ncols=3):
    rng = np.random.default_rng(seed)
    n = counts_np.shape[0]
    cols_np = [np.arange(n, dtype=np.int32)]
    for _ in range(ncols - 1):
        cols_np.append(
            rng.integers(-(2**31), 2**31, size=n).astype(np.int32)
        )
    want, want_cum, live = _reference(cols_np, counts_np, capacity)
    cols, cum_col, total = expand2_kernel.expand_rows2(
        [jnp.asarray(c) for c in cols_np], jnp.asarray(counts_np), capacity
    )
    assert int(total) == int(counts_np.sum())
    got = np.stack([np.asarray(c) for c in cols], axis=-1)
    np.testing.assert_array_equal(got[:live], want[:live, :ncols])
    np.testing.assert_array_equal(np.asarray(cum_col)[:live], want_cum[:live])


def test_random_counts_with_culls():
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 9, size=700).astype(np.int32)
    counts[rng.random(700) < 0.4] = 0
    _run_case(counts, capacity=int(counts.sum()) + 300)


def test_odd_window_count_and_partial_liveness():
    # capacity -> odd window count; the pair (k, k+nw2) has a dead B half
    # for most k (total ~ 0.6 * capacity)
    counts = np.ones(1600, np.int32)
    _run_case(counts, capacity=2560)  # 5 windows, nw2=3, total=1600


def test_long_culled_run_spans_chunks():
    counts = np.ones(3000, np.int32)
    counts[100:2500] = 0
    _run_case(counts, capacity=1024)


def test_saturated_span_refill_both_halves():
    # >512 one-element gaussians per window: every window (both halves)
    # exercises the refill loop.
    counts = np.ones(4000, np.int32)
    _run_case(counts, capacity=4096)


def test_overflow_truncation():
    counts = np.full(300, 11, np.int32)
    _run_case(counts, capacity=1536)


def test_dead_tail_and_unaligned_capacity():
    counts = np.array([5, 0, 3, 0, 0, 2] * 10, np.int32)
    _run_case(counts, capacity=1000)


def test_all_culled():
    counts = np.zeros(600, np.int32)
    cols, cum_col, total = expand2_kernel.expand_rows2(
        [jnp.arange(600, dtype=jnp.int32)], jnp.asarray(counts), 512
    )
    assert int(total) == 0


@pytest.mark.parametrize("scene_cls", [SimpleTestGaussiansScene, TestSortScene])
def test_keygen_pallas2_matches_repeat(scene_cls):
    """Full keygen pass: pallas2 expansion == repeat expansion, bit for
    bit (the packed id|w / tile0|h round trip and the cum - w*h offset
    recovery included)."""
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
    el_rep, _ = keygen.generate_sort_elements(
        *args, dataclasses.replace(base, expansion_method="repeat"), capacity
    )
    el_p2, _ = keygen.generate_sort_elements(
        *args, dataclasses.replace(base, expansion_method="pallas2"), capacity
    )
    np.testing.assert_array_equal(
        np.asarray(el_rep.tile), np.asarray(el_p2.tile)
    )
    np.testing.assert_array_equal(
        np.asarray(el_rep.depth), np.asarray(el_p2.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(el_rep.index), np.asarray(el_p2.index)
    )
    assert int(el_rep.count) == int(el_p2.count)
