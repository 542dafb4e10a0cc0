"""Sort tier equivalence: all backends must produce the identical order."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk3dgaussiansplatting_tpu.core.config import SENTINEL
from vk3dgaussiansplatting_tpu.ops.bitonic import sort_elements_bitonic
from vk3dgaussiansplatting_tpu.ops.keygen import SortElements
from vk3dgaussiansplatting_tpu.ops.sort import sort_elements_xla


def _random_elements(rng, e, num_tiles=100, with_sentinels=True):
    tile = rng.integers(0, num_tiles, e).astype(np.uint32)
    depth = rng.integers(0, 1 << 20, e).astype(np.uint32)
    idx = np.arange(e, dtype=np.uint32)
    if with_sentinels:
        dead = rng.random(e) < 0.3
        tile[dead] = SENTINEL
        depth[dead] = SENTINEL
        idx = np.where(dead, np.uint32(SENTINEL), idx)
    return SortElements(
        tile=jnp.asarray(tile),
        depth=jnp.asarray(depth),
        index=jnp.asarray(idx),
        count=jnp.uint32((tile != SENTINEL).sum()),
    )


@pytest.mark.parametrize("e", [256, 4096])
def test_bitonic_matches_xla(rng, e):
    el = _random_elements(rng, e)
    a = jax.jit(sort_elements_xla)(el)
    b = jax.jit(sort_elements_bitonic)(el)
    np.testing.assert_array_equal(np.asarray(a.tile), np.asarray(b.tile))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.index), np.asarray(b.index))


def test_bitonic_rejects_non_pow2(rng):
    el = _random_elements(rng, 100)
    with pytest.raises(ValueError):
        sort_elements_bitonic(el)


def test_xla_sort_u16_tile_path_ties_resolve_by_index(rng):
    # same tie contract through the u16-tile fast path (num_tiles < 0xFFFF),
    # which also uses the unstable 3-key formulation.
    e = 512
    tile = np.repeat(np.arange(8, dtype=np.uint32), 64)
    depth = np.tile(np.repeat(np.arange(8, dtype=np.uint32), 8), 8)
    idx = np.arange(e, dtype=np.uint32)
    el = SortElements(
        jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(idx), jnp.uint32(e)
    )
    out = jax.jit(lambda x: sort_elements_xla(x, num_tiles=64))(el)
    i = np.asarray(out.index)
    t = np.asarray(out.tile)
    d = np.asarray(out.depth)
    key = (t.astype(np.uint64) << 40) | (d.astype(np.uint64) << 20) | i.astype(np.uint64)
    assert (np.diff(key.astype(np.int64)) > 0).all()


def test_xla_sort_ties_resolve_by_index(rng):
    # duplicate (tile, depth) pairs across distinct gaussians: stable sort
    # must keep allocation (index) order — the reference's deterministic
    # equivalent (SURVEY.md §7).
    e = 512
    tile = np.repeat(np.arange(8, dtype=np.uint32), 64)
    depth = np.tile(np.repeat(np.arange(8, dtype=np.uint32), 8), 8)
    idx = np.arange(e, dtype=np.uint32)
    el = SortElements(jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(idx), jnp.uint32(e))
    out = jax.jit(sort_elements_xla)(el)
    i = np.asarray(out.index)
    t = np.asarray(out.tile)
    d = np.asarray(out.depth)
    key = (t.astype(np.uint64) << 40) | (d.astype(np.uint64) << 20) | i.astype(np.uint64)
    assert (np.diff(key.astype(np.int64)) > 0).all()
