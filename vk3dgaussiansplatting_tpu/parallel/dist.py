"""Distributed frame pipeline — multi-chip rendering via shard_map.

Design (SURVEY.md §7 step 6; no reference counterpart — the reference is
single-GPU):

  1. **Gaussian sharding**: the table is split evenly over the mesh's
     "shard" axis; each device runs keygen on its slice (global gaussian ids
     = local id + shard offset).
  2. **Frame-data replication**: per-gaussian blend inputs (color, inverse
     covariance, screen position — 36 B/gaussian) are all-gathered so any
     device can blend elements referencing any gaussian.
  3. **Tile-ownership exchange**: screen-tile *rows* are block-partitioned
     over devices.  Each device buckets its elements by owner (a stable local
     sort by destination) into equal-capacity per-peer slabs and performs ONE
     `all_to_all` — the distributed analogue of the reference's global radix
     scatter (RadixSortScatter.comp), with XLA collectives over ICI instead
     of HBM atomics.  Slab overflow drops elements, mirroring the reference's
     sort-list overflow rule (InitSortList.comp:143); capacity is sized by
     the same slack formula so drops only occur under extreme skew.
  4. **Local sort / ranges / blend**: each device 3-key sorts its received
     elements by (tile, depth, gaussian id) — equivalent to the single-chip
     stable (tile, depth) sort because allocation order is gaussian-id order
     — then computes ranges and blends its strip of the image.  The output
     stays sharded along image rows (one strip per device).

Bit-parity: because the final per-device sort orders by the full
(tile, depth, id) key, the blended strip is independent of exchange arrival
order, and an N-device render equals the 1-device render up to the
documented float tolerances (exactly, for the integer element lists).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.config import SENTINEL, RenderConfig
from ..models.gaussians import GaussianTable
from ..ops import blend as blend_ops
from ..ops import keygen as keygen_ops
from ..ops import ranges as ranges_ops
from ..ops.keygen import GaussianFrameData, SortElements
from .mesh import SHARD_AXIS


def _pad_table(table: GaussianTable, multiple: int) -> GaussianTable:
    """Pad the gaussian table so N divides it; padding gaussians sit behind
    the near plane (z = +inf in view space is awkward — use w-space far
    behind the camera is camera-dependent, so instead give them zero opacity
    AND zero scale; they cull to zero tiles because their NDC check fails or
    their extent is empty)."""
    import numpy as np

    n = table.position.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return table
    return GaussianTable(
        position=np.concatenate(
            [np.asarray(table.position), np.zeros((pad, 3), np.float32)]
        ),
        scale=np.concatenate([np.asarray(table.scale), np.zeros((pad, 3), np.float32)]),
        rot=np.concatenate(
            [
                np.asarray(table.rot),
                np.tile(np.array([[1, 0, 0, 0]], np.float32), (pad, 1)),
            ]
        ),
        sh=np.concatenate(
            [np.asarray(table.sh), np.zeros((pad, 16, 3), np.float32)]
        ),
        opacity=np.concatenate([np.asarray(table.opacity), np.zeros(pad, np.float32)]),
    )


class DistConfig(NamedTuple):
    """Static distributed-layout parameters."""

    num_devices: int
    tile_rows_per_device: int  # grid_height rows per shard
    local_capacity: int  # keygen capacity per device
    slab_capacity: int  # per-peer exchange capacity


def plan_distribution(
    config: RenderConfig, num_gaussians: int, num_devices: int
) -> DistConfig:
    if config.grid_height % num_devices != 0:
        raise ValueError(
            f"grid_height={config.grid_height} must divide evenly over "
            f"{num_devices} devices (pad the image height)"
        )
    total_capacity = config.sort_capacity(num_gaussians)
    local_capacity = -(-total_capacity // num_devices)
    # per-peer slab: everything one device generates could target one peer
    slab_capacity = local_capacity
    return DistConfig(
        num_devices=num_devices,
        tile_rows_per_device=config.grid_height // num_devices,
        local_capacity=local_capacity,
        slab_capacity=slab_capacity,
    )


def _bucket_by_destination(
    elements: SortElements, dist: DistConfig, config: RenderConfig
):
    """Pack local elements into [ndev * slab] slots grouped by destination
    device (tile-row owner), preserving gaussian-id order within each slab.

    Scatter-free (CLAUDE.md: XLA scatter is pathological on this stack —
    compiles >15 min and runs ~10 ms/M): one stable multi-operand sort keyed
    by destination groups the elements, `searchsorted` locates each
    destination's run, and ONE packed row gather materializes the slabs.
    Output slot (d, r) reads sorted position start_d + r when r < len_d and
    is sentinel otherwise; slab overflow (r >= slab never reached because
    slot r only ranges [0, slab)) drops the run's tail, mirroring the
    reference's sort-list overflow rule (InitSortList.comp:143).
    """
    ndev = dist.num_devices
    slab = dist.slab_capacity
    tiles_per_dev = dist.tile_rows_per_device * config.grid_width

    live = elements.tile != jnp.uint32(SENTINEL)
    dest = jnp.where(
        live, (elements.tile // tiles_per_dev).astype(jnp.uint32), jnp.uint32(ndev)
    )
    # Stable sort by destination keeps allocation order within each bucket;
    # the payload columns ride the sort (cheaper than argsort + N gathers).
    dest_s, tile_s, depth_s, index_s = jax.lax.sort(
        (dest, elements.tile, elements.depth, elements.index),
        dimension=0,
        num_keys=1,
        is_stable=True,
    )

    # Run start of each destination in the sorted order.
    starts = jnp.searchsorted(
        dest_s, jnp.arange(ndev + 1, dtype=jnp.uint32), side="left"
    ).astype(jnp.int32)  # [ndev+1]

    # Output slot (d, r) <- sorted position starts[d] + r, masked past the run.
    d_of = jnp.arange(ndev * slab, dtype=jnp.int32) // slab
    r_of = jnp.arange(ndev * slab, dtype=jnp.int32) % slab
    src = starts[d_of] + r_of
    in_run = src < starts[d_of + 1]
    src = jnp.where(in_run, src, 0)

    # ONE wide-row gather (three u32 columns packed) — TPU gather cost is
    # per-row, independent of width.
    packed = jnp.stack([tile_s, depth_s, index_s], axis=-1)  # [E, 3]
    out = packed[src]  # [ndev*slab, 3]
    sent = jnp.uint32(SENTINEL)
    out = jnp.where(in_run[:, None], out, sent)
    return (
        out[:, 0].reshape(ndev, slab),
        out[:, 1].reshape(ndev, slab),
        out[:, 2].reshape(ndev, slab),
    )


def _sort3(tile, depth, index):
    """Deterministic 3-key sort (tile, depth, gaussian id)."""
    t, d, i = jax.lax.sort((tile, depth, index), dimension=0, num_keys=3)
    return t, d, i


def make_distributed_render(
    mesh,
    config: RenderConfig,
    dist: DistConfig,
    *,
    use_pallas_blend: bool = False,
    return_stats: bool = False,
):
    """Build the jitted multi-device frame function.

    Returns fn(table, view, proj, cam_pos) -> [H_padded, W, 3] float32 image
    (sharded over rows).  The gaussian table must be padded to a multiple of
    the device count (see _pad_table).

    With return_stats, returns (image, live) where live is the [ndev] int32
    per-device count of live sorted elements actually received and blended —
    the denominator the scaling benchmark must use (capacity slots are not
    work; VERDICT r1 weak #6).
    """
    ndev = dist.num_devices
    tiles_per_dev = dist.tile_rows_per_device * config.grid_width
    strip_height = dist.tile_rows_per_device * config.tile_size

    # Per-device blend config: a strip with its own tile grid.
    import dataclasses

    strip_config = dataclasses.replace(
        config,
        height=strip_height,
        # width unchanged; grid derived properties follow height/width
    )

    def per_device(table, view, proj, cam_pos):
        # table leaves arrive as the local shard [N/ndev, ...]
        shard_id = jax.lax.axis_index(SHARD_AXIS)
        n_local = table.position.shape[0]

        elements, frame = keygen_ops.generate_sort_elements(
            table, view, proj, cam_pos, config, dist.local_capacity
        )
        # globalize gaussian ids
        offset = (shard_id * n_local).astype(jnp.uint32)
        live = elements.index != jnp.uint32(SENTINEL)
        elements = SortElements(
            tile=elements.tile,
            depth=elements.depth,
            index=jnp.where(live, elements.index + offset, elements.index),
            count=elements.count,
        )

        # replicate frame data (all_gather along shard axis)
        frame_all = GaussianFrameData(
            color_alpha=jax.lax.all_gather(
                frame.color_alpha, SHARD_AXIS, tiled=True
            ),
            cov2d=jax.lax.all_gather(frame.cov2d, SHARD_AXIS, tiled=True),
            cov_inv=jax.lax.all_gather(frame.cov_inv, SHARD_AXIS, tiled=True),
            screen_pos=jax.lax.all_gather(
                frame.screen_pos, SHARD_AXIS, tiled=True
            ),
        )

        # bucket by tile-row owner and exchange
        bt, bd, bi = _bucket_by_destination(elements, dist, config)
        rt = jax.lax.all_to_all(bt, SHARD_AXIS, 0, 0, tiled=False)
        rd = jax.lax.all_to_all(bd, SHARD_AXIS, 0, 0, tiled=False)
        ri = jax.lax.all_to_all(bi, SHARD_AXIS, 0, 0, tiled=False)
        rt = rt.reshape(-1)
        rd = rd.reshape(-1)
        ri = ri.reshape(-1)

        # localize tile ids to this device's strip
        tile_base = (shard_id * tiles_per_dev).astype(jnp.uint32)
        live_r = rt != jnp.uint32(SENTINEL)
        rt = jnp.where(live_r, rt - tile_base, rt)

        st, sd, si = _sort3(rt, rd, ri)
        count = jnp.sum(live_r).astype(jnp.uint32)
        local_elements = SortElements(tile=st, depth=sd, index=si, count=count)
        ranges = ranges_ops.find_ranges(local_elements, tiles_per_dev)

        # Strip-local tile ids but global gaussian screen coordinates: the
        # blend needs the strip's absolute pixel-row origin.
        origin_y = shard_id * strip_height
        if use_pallas_blend:
            from ..ops.pallas import blend_kernel

            strip = blend_kernel.blend_tiles_pallas(
                local_elements, ranges, frame_all, strip_config, origin_y
            )
        else:
            strip = blend_ops.blend_tiles_xla(
                local_elements, ranges, frame_all, strip_config, origin_y
            )
        if return_stats:
            return strip, count.astype(jnp.int32).reshape(1)
        return strip  # [strip_height, W, 3]

    table_spec = GaussianTable(
        position=P(SHARD_AXIS),
        scale=P(SHARD_AXIS),
        rot=P(SHARD_AXIS),
        sh=P(SHARD_AXIS),
        opacity=P(SHARD_AXIS),
    )
    out_specs = (P(SHARD_AXIS), P(SHARD_AXIS)) if return_stats else P(SHARD_AXIS)
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(table_spec, P(), P(), P()),
        out_specs=out_specs,
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # without this the pallas expand/blend tiers cannot trace under
        # shard_map (jax >= 0.7 check_vma default).
        check_vma=False,
    )
    return jax.jit(fn)
