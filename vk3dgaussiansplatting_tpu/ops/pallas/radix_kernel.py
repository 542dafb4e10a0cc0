"""Radix sort tier — status and staged plan.

The reference's performance sorter is a FidelityFX-style 4-bit LSD radix sort
(Engine/Graphics/Sort/RadixSort.cpp + 6 shaders): per pass
Count -> Reduce -> Scan -> ScanAdd -> Scatter over
`roundUp4(32 + bits(numTiles-1))` key bits.

A Mosaic port is blocked on measured platform costs (round-2 probes,
2026-08-21, v5e via axon; scripts/r2_dma_probe.py, r2_sortpay_probe.py,
probe_dyngather.py — numbers in docs/PERFORMANCE.md):

  * the only in-kernel permutation primitive that compiles server-side is
    the [8,128] lane crossbar (`tpu.dynamic_gather` via take_along_axis) at
    84.9 ns/op — an in-block 512-element stable pre-sort by digit (the
    scatter's shared-memory analogue, RadixSortScatter.comp:91-135) costs
    ~0.9 us/block in crossbars alone, ~2 ns/element/pass before any DMA;
  * run-granularity dynamic-offset stores measure ~600 ns per 8 KB DMA —
    16 digit-runs per 512-block at garden scale is ~440K stores/pass,
    tens of ms of pure DMA issue; exact packing also needs dynamic-LENGTH
    DMAs, which Pallas does not have (padding + re-compaction doubles the
    movement);
  * XLA-level radix passes die on the apply step: scatter compiles
    pathologically (>15 min) and the gather-based inverse-permutation apply
    costs ~6 ns/row — one pass alone exceeds `lax.sort`'s whole budget;
  * `jax.lax.sort` measures 55.5 ms for the garden element sort
    ((u16 tile, u32 depth) keys + u32 idx at 14.19M) — ~3x the reference's
    hand-tuned radix on its own GPU, and still cheaper than every Pallas
    formulation analyzed above.

Until Mosaic grows wider dynamic-gather shapes or batched DMA descriptors,
the RADIX algorithm selection therefore executes the XLA sort restricted to
the *used* key bits semantics (identical output order — sorting the full
(tile, depth) pair lexicographically equals sorting the 64-bit key's used
bits, since the unused high bits are zero; RadixSort.cpp:201-204 exploits
the same fact in reverse).
"""

from __future__ import annotations

from ...core.config import RenderConfig
from ..keygen import SortElements


def sort_elements_radix(
    elements: SortElements, config: RenderConfig
) -> SortElements:
    """Radix-tier entry point; see module docstring for the current lowering."""
    from ..sort import sort_elements_xla

    # num_sort_bits() documents the used-bit count for parity with
    # RadixSort.cpp:203-204; the lexicographic sort is order-identical.
    _ = config.num_sort_bits()
    return sort_elements_xla(elements)
