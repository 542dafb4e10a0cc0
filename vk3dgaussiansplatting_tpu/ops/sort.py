"""Sort-element ordering — the reference's GPU sort subsystem, TPU-native.

The reference sorts {tileKey, depthKey, gaussianIdx} triples by the 64-bit key
(tileKey << 32) | depthKey with a FidelityFX-style 4-bit LSD radix sort
(Engine/Graphics/Sort/RadixSort.cpp) or a bitonic merge sort
(BitonicMergeSort.cpp), selected by `GPU_SORT_ALGORITHM` (Renderer.h:33).

TPUs have no native u64, so the key is kept as its two u32 words throughout
(the reference's own shaders also handle it word-split,
RadixSortCount.comp:60-73).  Two tiers:

  * XLA_SORT — `jax.lax.sort` with num_keys=2 (lexicographic (tile, depth),
    stable).  Stability makes the result identical to the radix order with the
    deterministic allocation of ops.keygen.  Correctness tier, runs anywhere.
  * RADIX — Pallas multi-pass radix sort over only the *used* key bits
    (32 depth bits + ceil(log2(numTiles)) tile bits, mirroring
    `radixSortNumSortBits = roundUp4(32 + minNumBits(numTiles-1))`,
    RadixSort.cpp:203-204).  Performance tier (ops/pallas/radix_kernel.py).

Sentinel slots (0xFFFFFFFF everywhere) sort to the end, exactly like the
reference's cleared-buffer padding (Subrenderer.cpp:42-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import RenderConfig, SortAlgorithm
from .keygen import SortElements


def sort_elements_xla(
    elements: SortElements, num_tiles: int | None = None
) -> SortElements:
    """Lexicographic sort by (tile, depth) via XLA's sort HLO, order-stable.

    Two cost tricks, both order-preserving (probed on v5e, 2026-08-21,
    scripts/r2_sortvariants_probe.py — numbers in docs/PERFORMANCE.md):

    * When the tile-id range provably fits in 16 bits (every benchmark
      resolution: 8160 tiles at 1080p), the tile key is sorted as uint16 —
      XLA's TPU sort cost is ~bytes-proportional (u16 keys: 55.5 ms vs u32
      59.5 ms at 14.19M).  Live tiles are < 0xFFFF and the 0xFFFFFFFF
      sentinel maps to 0xFFFF, still the maximum.
    * The index column is promoted from payload to a THIRD sort key with
      `is_stable=False` (44.3 ms vs 55.5 ms stable at 14.19M).  The result
      is deterministically identical to the stable 2-key sort: within an
      equal (tile, depth) pair the gaussian ids are distinct (a gaussian
      emits at most one element per tile) and ascend with keygen slot
      order, so ordering ties by the id column reproduces stability; the
      all-equal sentinel ties are order-irrelevant.
    """
    if num_tiles is not None and num_tiles < 0xFFFF:
        tile16, depth, index = jax.lax.sort(
            (elements.tile.astype(jnp.uint16), elements.depth, elements.index),
            dimension=0,
            num_keys=3,
            is_stable=False,
        )
        from ..core.config import SENTINEL

        tile = jnp.where(
            tile16 == jnp.uint16(0xFFFF),
            jnp.uint32(SENTINEL),
            tile16.astype(jnp.uint32),
        )
    else:
        tile, depth, index = jax.lax.sort(
            (elements.tile, elements.depth, elements.index),
            dimension=0,
            num_keys=3,
            is_stable=False,
        )
    return SortElements(tile=tile, depth=depth, index=index, count=elements.count)


def sort_elements(
    elements: SortElements, config: RenderConfig
) -> SortElements:
    """Dispatch on the configured sort algorithm."""
    algo = config.sort_algorithm
    if algo == SortAlgorithm.AUTO:
        on_tpu = jax.default_backend() == "tpu"
        algo = SortAlgorithm.RADIX if on_tpu else SortAlgorithm.XLA_SORT
    if algo == SortAlgorithm.XLA_SORT:
        return sort_elements_xla(elements, num_tiles=config.num_tiles)
    if algo == SortAlgorithm.BITONIC:
        from .bitonic import sort_elements_bitonic

        return sort_elements_bitonic(elements)
    if algo == SortAlgorithm.RADIX:
        from .pallas import radix_kernel

        return radix_kernel.sort_elements_radix(elements, config)
    raise ValueError(f"unknown sort algorithm {algo}")
