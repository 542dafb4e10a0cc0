"""Radix sort tier — status and staged plan.

The reference's performance sorter is a FidelityFX-style 4-bit LSD radix sort
(Engine/Graphics/Sort/RadixSort.cpp + 6 shaders): per pass
Count -> Reduce -> Scan -> ScanAdd -> Scatter over
`roundUp4(32 + bits(numTiles-1))` key bits.

A Mosaic port is currently blocked on measured platform facts (2026-08-17,
v5e via axon; scripts/probe_mosaic_gather.py, scripts/sort_probe*.py):

  * Pallas TPU has NO in-kernel dynamic gather/scatter/sort lowering — the
    radix scatter's in-block stable permutation (RadixSortScatter.comp:91-135
    uses shared-memory sub-sorts) has no efficient Mosaic primitive;
  * one-hot-matmul permutation costs O(chunk) MACs per element: with chunks
    large enough for efficient bucket-run DMAs (>=2 KB) it exceeds the XLA
    sort's total cost per pass;
  * XLA-level scatter compiles pathologically (>15 min) and runs ~10 ms/M;
    XLA-level gather runs ~6.5 ns/row — a 12-pass radix built from XLA
    primitives is strictly slower than XLA's own sort;
  * `jax.lax.sort` (stable, multi-operand) measured 25.4 ms at 13M elements —
    within 1.3x of the reference's hand-tuned radix on its own GPU.

Until Mosaic grows a dynamic-gather/scatter primitive (or a DMA-descriptor
batch API), the RADIX algorithm selection therefore executes the XLA sort
restricted to the *used* key bits semantics (identical output order —
sorting the full (tile, depth) pair lexicographically equals sorting the
64-bit key's used bits, since the unused high bits are zero;
RadixSort.cpp:201-204 exploits the same fact in reverse).
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
