"""Round-2 probe: keygen stage split + new blend kernel timing (one TPU run).

Usage: scripts/tpu_run.sh /tmp/r2_probe.txt 2400 600 2 -- \
           python -u scripts/r2_probe.py --scene train7k_720p --mult 1.673
"""

import argparse
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def bench(name, make_digest, iters=8):
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + make_digest(acc * jnp.float32(1e-20))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from bench import SCENES
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel, expand_kernel
    from vk3dgaussiansplatting_tpu.render import project
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_cloud_table

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="train7k_720p", choices=SCENES)
    ap.add_argument("--mult", type=float, default=1.673)
    args = ap.parse_args()

    n_gauss, width, height, target = SCENES[args.scene]
    config = RenderConfig(
        width=width, height=height, sort_algorithm=SortAlgorithm.XLA_SORT,
        capacity_pow_two=False,
    )
    capacity = config.sort_capacity(n_gauss)
    print(f"{args.scene}: n={n_gauss} capacity={capacity} tiles={config.num_tiles}",
          flush=True)

    host = procedural_cloud_table(n_gauss, seed=42)
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    mult = args.mult

    table = jax.device_put(
        GaussianTable(
            position=jnp.asarray(host.position),
            scale=jnp.asarray(host.scale * np.float32(mult)),
            rot=jnp.asarray(host.rot),
            sh=jnp.asarray(host.sh),
            opacity=jnp.asarray(host.opacity),
        )
    )
    del host
    view, proj = cam.matrices()
    vj, pj, cj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)

    # --- keygen stage A: per-gaussian math only --------------------------
    def stage_a(s):
        v2 = vj.at[2, 3].add(s)
        pos = table.position
        pos_view = project.view_transform(pos, v2)
        ndc = project.ndc_position(pos_view, pj)
        visible = keygen_ops.cull_mask(pos_view, ndc, config)
        depth = project.depth_key(pos_view[:, 2], config)
        cov2d = project.compute_cov2d(table.scale, table.rot, pos_view, v2, config)
        screen_pos = project.screen_space_position(pos_view, pj, config)
        extents = project.tile_extents(screen_pos, cov2d, config)
        to_gauss = project.normalize_dirs(pos - cj[None, :])
        rgb = project.sh_color(to_gauss, table.sh, config.sh_mode)
        return (jnp.sum(rgb[:64]) + jnp.sum(extents[:64].astype(jnp.float32))
                + jnp.sum(depth[:64].astype(jnp.float32))
                + jnp.sum(visible[:64]) + jnp.sum(screen_pos[:64]))

    bench("keygen A (per-gaussian math)", stage_a)

    # --- keygen stage B: expansion kernel only ---------------------------
    ext, counts, depth = jax.jit(lambda: _pre(table, vj, pj, config))()
    jax.block_until_ready(counts)

    def stage_b(s):
        c2 = counts + (s.astype(jnp.int32) * 0)
        cols, total = expand_kernel.expand_rows(
            [jnp.arange(n_gauss, dtype=jnp.int32)] * 6, c2, capacity
        )
        return jnp.sum(cols[0][:64].astype(jnp.float32)) + total.astype(jnp.float32)

    bench("keygen B (expansion)", stage_b)

    # --- full pipeline pieces for blend ----------------------------------
    elements, frame = jax.jit(
        lambda: keygen_ops.generate_sort_elements(table, vj, pj, cj, config, capacity)
    )()
    sorted_elems = jax.jit(lambda: sort_ops.sort_elements_xla(elements))()
    ranges = jax.jit(lambda: ranges_ops.find_ranges(sorted_elems, config.num_tiles))()
    jax.block_until_ready(ranges)
    print(f"live elements: {int(elements.count)}", flush=True)

    def blend_digest(s):
        fr2 = keygen_ops.GaussianFrameData(
            color_alpha=frame.color_alpha + s,
            cov2d=frame.cov2d,
            cov_inv=frame.cov_inv,
            screen_pos=frame.screen_pos,
        )
        img = blend_kernel.blend_tiles_pallas_flat(sorted_elems, ranges, fr2, config)
        return jnp.sum(img[::97, ::97, 0])

    bench("blend v2 (flat, incl gather)", blend_digest, iters=4)


def _pre(table, vj, pj, config):
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.render import project

    pos_view = project.view_transform(table.position, vj)
    ndc = project.ndc_position(pos_view, pj)
    visible = keygen_ops.cull_mask(pos_view, ndc, config)
    depth = project.depth_key(pos_view[:, 2], config)
    cov2d = project.compute_cov2d(table.scale, table.rot, pos_view, vj, config)
    screen_pos = project.screen_space_position(pos_view, pj, config)
    extents = project.tile_extents(screen_pos, cov2d, config)
    w = extents[:, 2] - extents[:, 0]
    h = extents[:, 3] - extents[:, 1]
    counts = jnp.where(visible, w * h, 0).astype(jnp.int32)
    return extents, counts, depth


if __name__ == "__main__":
    main()
