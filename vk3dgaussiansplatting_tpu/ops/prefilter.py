"""Temporal depth prefiltering — drop past-saturation gaussians at keygen.

The reference pays full price for every sort element and lets the blend's
per-pixel early-out discard the saturated tail every frame
(RenderGaussians.comp:136-142).  The temporal-caps machinery (ops/capped.py)
already re-derives each tile's saturation depth per frame; this module
carries that knowledge UPSTREAM of the expansion/sort as a per-tile depth-key
threshold map so that gaussians provably behind every tile they touch are
never expanded, sorted, or gathered at all — the frame's per-element passes
then run on a smaller static capacity (the steady program set, bench.py).

Conservativeness argument (the correctness anchor):

  * thresholds[t] is a uint32 depth key; SENTINEL (0xFFFFFFFF) disables
    filtering for tile t.
  * a gaussian is dropped only when its depth key exceeds the MAX of the
    thresholds over a neighborhood that CONTAINS its whole tile rect
    (the dilated-max map; gaussians whose rect exceeds the dilation radius
    are never dropped).  Hence every dropped element of tile t has
    depth > thresholds[t]:   dropped => depth > max_rect >= thresholds[t].
  * therefore tile t's surviving sorted range contains ALL elements with
    depth <= thresholds[t] — a frame is provably exact (within the capped
    tolerance contract) for tile t when every pixel's transmittance is
    below the stop threshold at the threshold CROSSING inside the kept
    range (ops/capped.py truncates the capped blend there and validates).

The thresholds are updated each frame exactly like the caps: tiles that are
margin-deep saturated publish the depth at their capped end; everything else
publishes SENTINEL (unfiltered).  A tile that fails validation while
filtered escalates to SENTINEL for the next frame (see ops/capped.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SENTINEL, RenderConfig

# Dilation radius in tiles: rects up to (2R+1) x (2R+1) around the center
# tile are filterable; bigger gaussians bypass the filter (rare — the mean
# rect covers ~2 tiles at benchmark scale).  Small R also bounds how far an
# unfiltered (SENTINEL) tile poisons its neighborhood.
RADIUS = 2


def init_thresholds(config: RenderConfig):
    """All-SENTINEL threshold map: filtering disabled everywhere."""
    return jnp.full((config.num_tiles,), jnp.uint32(SENTINEL))


def dilate_thresholds(thr, config: RenderConfig, radius: int = RADIUS):
    """[T] u32 -> [T] u32 max over the (2r+1)^2 tile neighborhood (clipped).

    Separable running max; the tile grid is tiny (~8K entries) so this is
    noise next to any per-gaussian work.
    """
    gh, gw = config.grid_height, config.grid_width
    m = thr.reshape(gh, gw)
    for axis, size in ((0, gh), (1, gw)):
        acc = m
        for s in range(1, radius + 1):
            lo = jnp.concatenate(
                [
                    jnp.take(m, jnp.arange(s, size), axis=axis),
                    jnp.take(m, jnp.full((s,), size - 1), axis=axis),
                ],
                axis=axis,
            )
            hi = jnp.concatenate(
                [
                    jnp.take(m, jnp.zeros((s,), jnp.int32), axis=axis),
                    jnp.take(m, jnp.arange(0, size - s), axis=axis),
                ],
                axis=axis,
            )
            acc = jnp.maximum(acc, jnp.maximum(lo, hi))
        m = acc
    return m.reshape(-1)


def gaussian_keep_mask(
    screen_pos,
    extents,
    depth,
    thr_dilated,
    config: RenderConfig,
    radius: int = RADIUS,
):
    """Per-gaussian conservative keep mask under the dilated threshold map.

    Args:
      screen_pos: [N, 2] pixel-space centers (render/project.py).
      extents:    [N, 4] i32 tile rect (x0, y0, x1, y1), half-open.
      depth:      [N] uint32 depth keys.
      thr_dilated:[T] u32 dilated max-threshold map (dilate_thresholds).
    Returns [N] bool — False only for gaussians provably invisible in every
    tile they touch (depth beyond every touched tile's threshold).
    """
    gw, gh = config.grid_width, config.grid_height
    ts = config.tile_size
    cx = jnp.clip(
        (screen_pos[:, 0] / jnp.float32(ts)).astype(jnp.int32), 0, gw - 1
    )
    cy = jnp.clip(
        (screen_pos[:, 1] / jnp.float32(ts)).astype(jnp.int32), 0, gh - 1
    )
    # rect must fit inside the dilation neighborhood of the center tile for
    # the dilated-map lookup to bound the rect max.
    r = jnp.int32(radius)
    coverable = (
        (extents[:, 0] >= cx - r)
        & (extents[:, 2] <= cx + r + 1)
        & (extents[:, 1] >= cy - r)
        & (extents[:, 3] <= cy + r + 1)
    )
    # The lookup is a per-gaussian row gather from the tiny tile-grid
    # table.  Width-1 gathers are the SLOWEST width on this stack (~6.8
    # ns/row vs ~1.4 for width-4 small-table rows, r4 width probe):
    # materialize the map at width 4 and take column 0.
    d4 = jnp.tile(thr_dilated[:, None], (1, 4))
    d = jnp.take(d4, cy * gw + cx, axis=0, mode="clip")[:, 0]
    return jnp.logical_not(coverable) | (depth <= d)
