"""Segment compactor (ops/pallas/compact_kernel.py) unit tests.

Checks the packed-chunk copy against a numpy reference: arbitrary per-chunk
source starts (any alignment), in-bounds clamping, and u32 bit passthrough.
"""

import numpy as np
import jax.numpy as jnp

from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import (
    CHUNK,
    compact_segments,
)


def _reference(src, src0, ep):
    e_pad = -(-len(src) // CHUNK) * CHUNK + 2 * CHUNK
    padded = np.zeros(e_pad, src.dtype)
    padded[: len(src)] = src
    out = np.zeros(ep, src.dtype)
    for j, s0 in enumerate(np.clip(src0, 0, e_pad - 2 * CHUNK)):
        out[j * CHUNK : (j + 1) * CHUNK] = padded[s0 : s0 + CHUNK]
    return out


def test_unaligned_runs_roundtrip():
    rng = np.random.default_rng(5)
    e = 5000
    src = rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32)
    ep = 2048
    src0 = rng.integers(0, e - CHUNK, ep // CHUNK).astype(np.int32)
    got = np.asarray(compact_segments(jnp.asarray(src), jnp.asarray(src0), ep))
    np.testing.assert_array_equal(got, _reference(src, src0, ep))


def test_contiguous_tile_segments():
    """The capped-path shape: per-tile runs split into 128-lane chunks."""
    rng = np.random.default_rng(6)
    e = 4096
    src = np.arange(e, dtype=np.uint32)
    starts = np.array([17, 900, 2111, 3333], np.int32)
    counts = np.array([300, 129, 256, 128], np.int32)
    chunks = []
    for s, c in zip(starts, counts):
        n128 = -(-c // CHUNK)
        for k in range(n128):
            chunks.append(s + k * CHUNK)
    ep = -(-len(chunks) // 4) * 4 * CHUNK
    while len(chunks) < ep // CHUNK:
        chunks.append(0)
    src0 = np.asarray(chunks, np.int32)
    got = np.asarray(compact_segments(jnp.asarray(src), jnp.asarray(src0), ep))
    want = _reference(src, src0, ep)
    np.testing.assert_array_equal(got, want)
    # every live chunk is the identity run starting at its src0
    assert got[0] == 17 and got[CHUNK - 1] == 17 + 127


def test_out_of_bounds_chunks_clamp():
    src = np.arange(600, dtype=np.uint32)
    src0 = np.array([10_000, -50, 0, 3], np.int32)
    got = np.asarray(compact_segments(jnp.asarray(src), jnp.asarray(src0), 512))
    want = _reference(src, src0, 512)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Run-granular compactor (compact_runs) — alignment-preserving slab layout
# ---------------------------------------------------------------------------

from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import compact_runs


def _slab_layout(starts, counts, wmax):
    """Slab bases for alignment-preserving runs (mirrors ops/capped.py)."""
    off = starts % CHUNK
    slabw = -(-(off + counts) // CHUNK) * CHUNK
    assert (slabw <= wmax).all()
    sbases = (np.cumsum(slabw) - slabw).astype(np.int32)
    ep = -(-int(slabw.sum()) // 512) * 512 + 512
    return off, slabw, sbases, ep


def test_compact_runs_matches_source_runs():
    rng = np.random.default_rng(11)
    e, wmax = 20_000, 512 + CHUNK
    src = rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32)
    nt = 37
    counts = rng.integers(0, 513, nt).astype(np.int32)
    counts[rng.random(nt) < 0.3] = 0  # empty tiles interleaved
    starts = rng.integers(0, e - wmax, nt).astype(np.int32)
    off, slabw, sbases, ep = _slab_layout(starts, counts, wmax)
    got = np.asarray(
        compact_runs(
            jnp.asarray(src), jnp.asarray(starts), jnp.asarray(sbases),
            ep, wmax,
        )
    )
    # contractual lanes: each tile's [sbase+off, sbase+off+count)
    for s, b, o, c in zip(starts, sbases, off, counts):
        np.testing.assert_array_equal(got[b + o : b + o + c], src[s : s + c])


def test_compact_runs_single_and_empty():
    """Degenerate layouts: one tile at an unaligned start; all-empty."""
    e, wmax = 4096, 256
    src = np.arange(e, dtype=np.uint32)
    starts = np.array([1001], np.int32)
    counts = np.array([100], np.int32)
    off, slabw, sbases, ep = _slab_layout(starts, counts, wmax)
    got = np.asarray(
        compact_runs(
            jnp.asarray(src), jnp.asarray(starts), jnp.asarray(sbases),
            ep, wmax,
        )
    )
    o = int(off[0])
    np.testing.assert_array_equal(got[o : o + 100], src[1001 : 1101])
    got = compact_runs(
        jnp.asarray(src),
        jnp.asarray(np.zeros(5, np.int32)),
        jnp.asarray(np.zeros(5, np.int32)),
        512, wmax,
    )
    assert got.shape == (512,)
