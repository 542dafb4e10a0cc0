"""Medium-scale (>=1M element) correctness cross-check on TPU.

The numpy oracle is a sequential reference — unusable beyond ~1e5 elements.
This script provides the garden-scale correctness evidence (VERDICT r1 item
8) with vectorized cross-checks between independent tiers at >=1M live
elements:

  1. expansion parity: the Pallas monotone-expansion kernel vs the
     jnp.repeat formulation, bit-for-bit on every expanded column;
  2. element-list integrity: after the (tile, depth) sort, keys are
     non-decreasing, sentinels pack the tail, live count matches keygen;
  3. blend parity: Pallas tiled kernel vs the vectorized XLA tier — float
     image max|diff| and quantized u8 max diff (contract: <=1,
     docs/TOLERANCES.md).

Run on TPU:
  scripts/tpu_run.sh /tmp/scale_parity.txt 3600 900 2 -- \\
      python -u scripts/scale_parity_check.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def main():
    import math

    from vk3dgaussiansplatting_tpu.core.config import (
        SENTINEL,
        RenderConfig,
        SortAlgorithm,
    )
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel, expand_kernel
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_cloud_table

    n = 550_000  # ~1.1M live elements at this camera (assert below)
    config = RenderConfig(
        width=512,
        height=512,
        capacity_slack_per_tile=1024,
        sort_algorithm=SortAlgorithm.XLA_SORT,
        capacity_pow_two=False,
    )
    capacity = config.sort_capacity(n)
    print(f"scale parity: n={n} capacity={capacity} 512x512", flush=True)

    table_h = procedural_cloud_table(n, seed=5)
    cam = Camera(1.0)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    view, proj = cam.matrices()
    table = jax.device_put(jax.tree.map(jnp.asarray, table_h))
    vj, pj, cj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)

    # --- 1. expansion parity (pallas vs repeat), bit-for-bit --------------
    import dataclasses

    t0 = time.time()
    cfg_pl = dataclasses.replace(config, expansion_method="pallas")
    cfg_rp = dataclasses.replace(config, expansion_method="repeat")

    el_pl, frame = jax.jit(
        lambda t, v, p, c: keygen_ops.generate_sort_elements(
            t, v, p, c, cfg_pl, capacity
        )
    )(table, vj, pj, cj)
    el_rp, _ = jax.jit(
        lambda t, v, p, c: keygen_ops.generate_sort_elements(
            t, v, p, c, cfg_rp, capacity
        )
    )(table, vj, pj, cj)
    live = int(el_pl.count)
    for name in ("tile", "depth", "index"):
        a = np.asarray(getattr(el_pl, name))
        b = np.asarray(getattr(el_rp, name))
        neq = int((a != b).sum())
        assert neq == 0, f"expansion mismatch in {name}: {neq} slots differ"
    assert live >= 1_000_000, f"only {live} live elements — grow the scene"
    print(f"  [1] expansion parity OK at {live/1e6:.2f}M live elements "
          f"({time.time()-t0:.0f}s)", flush=True)

    # --- 2. sorted element-list integrity ---------------------------------
    t0 = time.time()
    el_s = jax.jit(lambda e: sort_ops.sort_elements(e, config))(el_pl)
    tile = np.asarray(el_s.tile)
    depth = np.asarray(el_s.depth)
    live_mask = tile != SENTINEL
    n_live = int(live_mask.sum())
    assert n_live == live, f"sort changed live count {n_live} != {live}"
    assert live_mask[:n_live].all(), "sentinels interleaved with live slots"
    t_live = tile[:n_live].astype(np.uint64)
    d_live = depth[:n_live].astype(np.uint64)
    key = (t_live << np.uint64(32)) | d_live
    assert (np.diff(key) >= 0).all(), "sorted keys not non-decreasing"
    print(f"  [2] sorted-list integrity OK ({time.time()-t0:.0f}s)", flush=True)

    # --- 3a. blend parity: pallas tiled vs pallas flat, bit-exact ---------
    t0 = time.time()
    ranges = jax.jit(
        lambda e: ranges_ops.find_ranges(e, config.num_tiles)
    )(el_s)
    img_pl = np.asarray(
        blend_kernel.blend_tiles_pallas(el_s, ranges, frame, config)
    )
    img_flat = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(el_s, ranges, frame, config)
    )
    neq = int((img_pl != img_flat).sum())
    lit = int((img_pl.sum(-1) > 0).sum())
    assert neq == 0, f"tiled vs flat kernel differ at {neq} pixels"
    print(f"  [3a] tiled == flat kernel bit-exact, lit px={lit} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # --- 3b. blend parity vs the XLA tier, evaluated on host CPU ----------
    # (the O(E*P) XLA tier would OOM / hit the scatter ban at this scale on
    # the chip; it runs fine on the host and is the tier the oracle anchors)
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        el_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), el_s)
        rg_c = jnp.asarray(np.asarray(ranges))
        fr_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), frame)
        img_xla = np.asarray(
            blend_ops.blend_tiles_xla(el_c, rg_c, fr_c, config)
        )
    fdiff = float(np.abs(img_pl - img_xla).max())
    u8_pl = np.asarray(blend_ops.quantize_image(jnp.asarray(img_pl)))
    u8_xla = np.asarray(blend_ops.quantize_image(jnp.asarray(img_xla)))
    udiff = int(np.abs(u8_pl.astype(np.int32) - u8_xla.astype(np.int32)).max())
    print(f"  [3b] pallas vs XLA tier: float max|diff|={fdiff:.2e}, "
          f"u8 max diff={udiff} ({time.time()-t0:.0f}s)", flush=True)
    assert udiff <= 1, f"u8 diff {udiff} exceeds the +-1 contract"
    assert lit > 1000

    # --- 4. capped path vs flat, +-1 u8 (ops/capped.py) -------------------
    t0 = time.time()
    from vk3dgaussiansplatting_tpu.ops import capped as capped_ops

    cfg_cap = dataclasses.replace(config, blend_depth_cap=512)
    img_cap = np.asarray(
        capped_ops.blend_tiles_capped(el_s, ranges, frame, cfg_cap)
    )
    u8_cap = np.asarray(blend_ops.quantize_image(jnp.asarray(img_cap)))
    cdiff = int(np.abs(u8_cap.astype(np.int32) - u8_pl.astype(np.int32)).max())
    print(f"  [4] capped(cap=512) vs flat: u8 max diff={cdiff} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert cdiff <= 1, f"capped path u8 diff {cdiff} exceeds +-1"

    print(f"SCALE PARITY OK: {live/1e6:.2f}M elements, u8 diff {udiff}, "
          f"capped diff {cdiff}", flush=True)


if __name__ == "__main__":
    main()
