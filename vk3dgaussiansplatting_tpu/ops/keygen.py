"""Sort-key generation — the InitSortList pass, TPU-native.

The reference kernel (InitSortList.comp) runs one thread per gaussian: cull,
compute the depth key and 2D covariance, evaluate SH color, then *atomically*
allocate one sort element per overlapped tile (`atomicAdd` on a global
counter, InitSortList.comp:131) and write `{tileKey, depthKey, gaussianIdx}`.

TPU/XLA has no atomics and no dynamic output shapes, so the allocation is
re-derived as a deterministic prefix-sum plan:

  1. per-gaussian overlap counts  c_i = w_i * h_i   (0 if culled)
  2. exclusive scan               off_i = sum_{k<i} c_k
  3. fixed-capacity expansion     slot e in [0, E) belongs to gaussian
                                  g(e) = repeat(arange(N), counts)[e]

The reference *already* pads to a static capacity
`ceilPow2(numGaussians + 64*16*numTiles)` (Renderer.cpp:725) and drops
elements beyond it (InitSortList.comp:143), so the masked-static formulation
is behaviour-faithful — including the overflow-drop rule (slots >= E are
truncated) and the 0xFFFFFFFF sentinel padding (Subrenderer.cpp:42-46).
Unlike the atomic version, slot order is deterministic: gaussians allocate in
index order, tiles within a gaussian in row-major order (the kernel's y/x
loop, InitSortList.comp:133-150).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import SENTINEL, RenderConfig
from ..render import project


class SortElements(NamedTuple):
    """Flat sort-element list, capacity E with sentinel padding.

    tile:  [E] uint32 tile key (SENTINEL for unused slots)
    depth: [E] uint32 depth key (SENTINEL for unused slots)
    index: [E] uint32 source gaussian index (SENTINEL for unused slots)
    count: []  uint32 number of live elements (== reference's
           cullData.numGaussiansToRender.x clamped to capacity)
    """

    tile: jax.Array
    depth: jax.Array
    index: jax.Array
    count: jax.Array


class GaussianFrameData(NamedTuple):
    """Per-gaussian frame intermediates (the reference's write-back of
    `color`/`covariance` into the gaussian buffer, InitSortList.comp:123-127,
    plus the screen position RenderGaussians recomputes per element).

    color_alpha: [N,4]  SH color rgb + opacity
    cov2d:       [N,3]  2D covariance (upper triangle)
    cov_inv:     [N,3]  inverse 2D covariance; alpha forced to 0 when the
                 determinant is 0 (RenderGaussians.comp:94-105)
    screen_pos:  [N,2]  pixel-space position
    """

    color_alpha: jax.Array
    cov2d: jax.Array
    cov_inv: jax.Array
    screen_pos: jax.Array


def cull_mask(pos_view, ndc, config: RenderConfig):
    """Near-plane + NDC-margin culling (InitSortList.comp:92-101)."""
    near_ok = -pos_view[:, 2] > jnp.float32(config.near_plane)
    lim = jnp.float32(config.culling_ndc_limit)
    ndc_ok = (jnp.abs(ndc[:, 0]) <= lim) & (jnp.abs(ndc[:, 1]) <= lim)
    return near_ok & ndc_ok


def _frame_geometry(table, view, proj, config):
    """Shared projection front half of InitSortList: view transform, cull,
    depth keys, EWA covariance, screen position, tile extents, and the
    per-gaussian emit mask (cull AND optional prefilter).  One
    implementation feeds both generate_sort_elements and the
    expansion-free counting probe so the steady-switch feasibility
    estimate can never drift from the real keygen (r4 code review)."""
    pos_view = project.view_transform(table.position, view)
    ndc = project.ndc_position(pos_view, proj)
    visible = cull_mask(pos_view, ndc, config)
    depth = project.depth_key(pos_view[:, 2], config)
    cov2d = project.compute_cov2d(
        table.scale, table.rot, pos_view, view, config
    )
    screen_pos = project.screen_space_position(pos_view, proj, config)
    extents = project.tile_extents(screen_pos, cov2d, config)
    return pos_view, visible, depth, cov2d, screen_pos, extents


def _emit_mask(visible, screen_pos, extents, depth, config, depth_thr):
    if depth_thr is None:
        return visible
    from . import prefilter

    dil = prefilter.dilate_thresholds(depth_thr, config)
    keep = prefilter.gaussian_keep_mask(
        screen_pos, extents, depth, dil, config
    )
    return visible & keep


def count_live_elements(table, view, proj, cam_pos, config, depth_thr=None):
    """Live sort-element count WITHOUT the expansion (projection + extents
    + optional prefilter + cumsum only).  Compiles in seconds — used to
    probe whether the prefiltered list fits a smaller steady capacity
    before paying the steady program set's compiles
    (pipeline.ChainedTemporalPlan.try_steady_switch)."""
    _pv, visible, depth, _c2, screen_pos, extents = _frame_geometry(
        table, view, proj, config
    )
    emit = _emit_mask(visible, screen_pos, extents, depth, config, depth_thr)
    w = extents[:, 2] - extents[:, 0]
    h = extents[:, 3] - extents[:, 1]
    counts = jnp.where(emit, w * h, 0).astype(jnp.int32)
    return jnp.sum(counts)


def generate_sort_elements(
    table,
    view,
    proj,
    cam_pos,
    config: RenderConfig,
    capacity: int,
    depth_thr=None,
):
    """Full InitSortList pass over the gaussian table.

    Args:
      table: GaussianTable of device arrays.
      view/proj: [4,4] float32 row-major camera matrices.
      cam_pos: [3] float32 camera world position.
      config: static render config (trace-time constants, the push-constant/
        spec-constant equivalent).
      capacity: static sort-element capacity E.
      depth_thr: optional [num_tiles] uint32 temporal depth-threshold map
        (ops/prefilter.py): gaussians provably behind every touched tile's
        threshold emit no elements, so the expansion/sort/ranges run on a
        smaller live list (and, with a matching smaller `capacity`, smaller
        programs).  None or an all-SENTINEL map reproduces the reference's
        unfiltered behavior bit-for-bit.

    Returns (SortElements, GaussianFrameData).
    """
    pos = table.position
    n = pos.shape[0]

    pos_view, visible, depth, cov2d, screen_pos, extents = _frame_geometry(
        table, view, proj, config
    )

    # SH color (InitSortList.comp:122-126). The direction normalize produces
    # NaN for a gaussian exactly at the camera position; such gaussians are
    # behind the near plane and culled, but the reference would still write
    # NaN color. We keep the color NaN-free via the cull mask for safety.
    to_gauss = project.normalize_dirs(pos - cam_pos[None, :])
    rgb = project.sh_color(to_gauss, table.sh, config.sh_mode)
    color_alpha = jnp.concatenate([rgb, table.opacity[:, None]], axis=-1)

    # Inverse 2D covariance (RenderGaussians.comp:94-105): zero determinant
    # zeroes the alpha instead.
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != jnp.float32(0.0)
    det_inv = jnp.where(det_ok, jnp.float32(1.0) / det, jnp.float32(0.0))
    cov_inv = (
        jnp.stack([cov2d[:, 2], -cov2d[:, 1], cov2d[:, 0]], axis=-1)
        * det_inv[:, None]
    )
    # (concatenate, not .at[:, 3].set — column-indexed updates lower to an
    # XLA scatter, banned in the frame path.)
    color_alpha = jnp.concatenate(
        [
            color_alpha[:, :3],
            jnp.where(det_ok[:, None], color_alpha[:, 3:4], jnp.float32(0.0)),
        ],
        axis=1,
    )

    # --- element allocation (scan replaces atomicAdd) ---------------------
    w = extents[:, 2] - extents[:, 0]
    h = extents[:, 3] - extents[:, 1]
    emit = _emit_mask(visible, screen_pos, extents, depth, config, depth_thr)
    counts = jnp.where(emit, w * h, 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1] if n > 0 else jnp.int32(0)
    offsets = cum - counts  # exclusive

    # Fixed-capacity expansion: slot -> gaussian id.  Truncation at capacity
    # is the reference's overflow-drop rule; padded tail slots are masked
    # below.  Two equivalent strategies (config.expansion_method):
    #   * searchsorted: slot j belongs to the first gaussian with
    #     cum(counts) > j — gather-only binary search (XLA TPU scatter, which
    #     jnp.repeat uses internally, measured ~100 ms at 8M capacity).
    #   * repeat: jnp.repeat(total_repeat_length=capacity).
    slot = jnp.arange(capacity, dtype=jnp.int32)
    live = slot < jnp.minimum(total, capacity)

    packed_cols = [
        jnp.arange(n, dtype=jnp.int32),
        offsets,
        jnp.maximum(w, 1),
        extents[:, 0],
        extents[:, 1],
        depth.astype(jnp.int32),
    ]
    method = config.expansion_method
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "repeat"
    if method in ("pallas", "stream"):
        # Pallas monotone-expansion kernels (ops/pallas/expand_kernel.py):
        # windowed compare-count + vreg crossbar gathers; avoids both the
        # XLA scatter inside jnp.repeat (~100 ms at 8M) and its ~6.5 ns/row
        # gather.  Bit-identical to the repeat path (tests/test_expand.py).
        from .pallas import expand_kernel

        if method == "stream" or (method == "pallas" and depth_thr is not None):
            # Prefilter-thinned counts (mean ~1 live element/source row)
            # stretch window spans past one 512-row chunk; the streamed
            # kernel amortizes the per-window DMAs + grid overhead across
            # STREAM_K-window steps there (r5 device A/B: 20.9 vs 25.5 ms
            # for the wide-span kernel at steady capacity).  Dense
            # unfiltered counts keep the per-window kernel — spans fit one
            # chunk and the streamed buffer over-fetches (34.6 vs 29.1 ms).
            cols, _ = expand_kernel.expand_rows_streamed(
                packed_cols, counts, capacity
            )
        else:
            cols, _ = expand_kernel.expand_rows(
                packed_cols, counts, capacity, wide_span=False
            )
    else:
        # XLA tier: gathers cost ~6.5 ns/row *independent of row width*
        # (measured), so the expansion performs exactly ONE row gather: all
        # per-slot values — including the gaussian id — ride the single
        # take() inside jnp.repeat as columns of a packed row.
        # (searchsorted expansion would be log2(N) gathers: 4.6x slower.)
        packed = jnp.stack(packed_cols, axis=-1)  # [N, 6] i32
        g = jnp.repeat(packed, counts, axis=0, total_repeat_length=capacity)
        cols = [g[:, k] for k in range(len(packed_cols))]
    gauss_of_slot = cols[0]
    local = slot - cols[1]
    # Dead slots may carry zero rows out of the pallas expansion; keep the
    # (masked-out) division defined.
    gw_safe = jnp.maximum(cols[2], 1)
    # Row-major within the gaussian's tile rect (InitSortList.comp:133-150).
    ly = local // gw_safe
    lx = local - ly * gw_safe
    tile_x = cols[3] + lx
    tile_y = cols[4] + ly
    tile_key = (tile_y * jnp.int32(config.grid_width) + tile_x).astype(jnp.uint32)

    sent = jnp.uint32(SENTINEL)
    elements = SortElements(
        tile=jnp.where(live, tile_key, sent),
        depth=jnp.where(live, cols[5].astype(jnp.uint32), sent),
        index=jnp.where(live, gauss_of_slot.astype(jnp.uint32), sent),
        count=jnp.minimum(total, capacity).astype(jnp.uint32),
    )
    frame = GaussianFrameData(
        color_alpha=color_alpha,
        cov2d=cov2d,
        cov_inv=cov_inv,
        screen_pos=screen_pos,
    )
    return elements, frame
