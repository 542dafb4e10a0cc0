"""Two-level vectorized binary search over large sorted device arrays.

A flat `jnp.searchsorted` over an N-row array costs log2(N) (~24 at garden
scale) gather rounds per probe set, and XLA row-gathers are issue-bound
(~6 ns/row regardless of contiguity, docs/PERFORMANCE.md).  Sorted data
decomposes the search: a coarse pass over the per-CHUNK last values (a
~N/1024-entry table — small-table gathers are ~20x cheaper) locates the
covering chunk, then log2(CHUNK) = 11 bounded bisection rounds on the big
array finish the job.  Exact by construction.

Shared by ops/ranges.py (FindRanges) and ops/pallas/expand_kernel.py (the
per-window source-row probes of the InitSortList expansion).
"""

from __future__ import annotations

import jax.numpy as jnp

CHUNK = 1024  # coarse-level granularity


def two_level_left_search(arr, probes):
    """Vectorized `searchsorted(arr, probes, side="left")` in two levels.

    arr:    [N] sorted array (any integer/uint dtype).
    probes: [P] probe values (same comparison domain as arr).
    Returns [P] int32 positions.  For integer keys, a side="right" search
    is `two_level_left_search(arr, probes + 1)`.
    """
    e = arr.shape[0]
    nc = -(-e // CHUNK)
    last_idx = jnp.minimum(
        (jnp.arange(nc, dtype=jnp.int32) + 1) * CHUNK - 1, e - 1
    )
    lasts = jnp.take(arr, last_idx)
    chunk = jnp.searchsorted(
        lasts, probes, side="left", method="scan_unrolled"
    ).astype(jnp.int32)

    lo = jnp.minimum(chunk * CHUNK, e)
    hi = jnp.minimum(lo + CHUNK, e)
    for _ in range(CHUNK.bit_length()):  # 11 rounds: 1024 -> ... -> 1 -> 0
        alive = lo < hi
        mid = (lo + hi) // 2
        v = jnp.take(arr, jnp.clip(mid, 0, e - 1))
        pred = v < probes
        lo = jnp.where(alive & pred, mid + 1, lo)
        hi = jnp.where(alive & jnp.logical_not(pred), mid, hi)
    return lo
