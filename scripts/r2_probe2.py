"""Round-2 probe #2: expansion v2, u16 sort, blend variants (one TPU run)."""

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

    # Materialize pipeline intermediates once.
    elements, frame = jax.jit(
        lambda: keygen_ops.generate_sort_elements(table, vj, pj, cj, config, capacity)
    )()
    counts_probe = jax.jit(
        lambda: jnp.bincount(
            jnp.where(elements.index == 0xFFFFFFFF, 0, elements.index).astype(jnp.int32),
            length=n_gauss,
        )
    )
    jax.block_until_ready(elements)
    print(f"live elements: {int(elements.count)}", flush=True)

    # expansion v2 (hierarchical count)
    from vk3dgaussiansplatting_tpu.render import project

    def counts_of(s):
        v2 = vj.at[2, 3].add(s)
        pos_view = project.view_transform(table.position, v2)
        ndc = project.ndc_position(pos_view, pj)
        visible = keygen_ops.cull_mask(pos_view, ndc, config)
        cov2d = project.compute_cov2d(table.scale, table.rot, pos_view, v2, config)
        screen_pos = project.screen_space_position(pos_view, pj, config)
        extents = project.tile_extents(screen_pos, cov2d, config)
        w = extents[:, 2] - extents[:, 0]
        h = extents[:, 3] - extents[:, 1]
        return jnp.where(visible, w * h, 0).astype(jnp.int32)

    counts = jax.jit(lambda: counts_of(jnp.float32(0.0)))()
    jax.block_until_ready(counts)

    def exp_digest(s):
        c2 = counts + (s.astype(jnp.int32) * 0)
        cols, total = expand_kernel.expand_rows(
            [jnp.arange(n_gauss, dtype=jnp.int32)] * 6, c2, capacity
        )
        return jnp.sum(cols[0][:64].astype(jnp.float32)) + total.astype(jnp.float32)

    bench("expansion v2", exp_digest)

    # full keygen with v2 expansion
    def keygen_digest(s):
        el, fr = keygen_ops.generate_sort_elements(
            table, vj.at[2, 3].add(s), pj, cj, config, capacity
        )
        return jnp.sum(el.depth[:8].astype(jnp.float32)) + el.count.astype(jnp.float32)

    bench("keygen v2", keygen_digest)

    # u16-tile sort
    def sort16_digest(s):
        el = keygen_ops.SortElements(
            tile=elements.tile,
            depth=elements.depth + s.astype(jnp.uint32),
            index=elements.index,
            count=elements.count,
        )
        se = sort_ops.sort_elements_xla(el, num_tiles=config.num_tiles)
        return jnp.sum(se.index[:8].astype(jnp.float32))

    bench("sort(xla,u16 tile)", sort16_digest, iters=3)

    sorted_elems = jax.jit(
        lambda: sort_ops.sort_elements_xla(elements, num_tiles=config.num_tiles)
    )()
    ranges = jax.jit(lambda: ranges_ops.find_ranges(sorted_elems, config.num_tiles))()
    jax.block_until_ready(ranges)

    # blend per-tile variant (bench.py default path)
    def blend_tile_digest(s):
        fr2 = keygen_ops.GaussianFrameData(
            color_alpha=frame.color_alpha + s,
            cov2d=frame.cov2d,
            cov_inv=frame.cov_inv,
            screen_pos=frame.screen_pos,
        )
        img = blend_kernel.blend_tiles_pallas(sorted_elems, ranges, fr2, config)
        return jnp.sum(img[::97, ::97, 0])

    bench("blend v2 per-tile (incl gather)", blend_tile_digest, iters=4)

    # sanity: per-tile vs flat pixel parity on TPU
    fr = frame
    img_a = jax.jit(
        lambda: blend_kernel.blend_tiles_pallas(sorted_elems, ranges, fr, config)
    )()
    img_b = jax.jit(
        lambda: blend_kernel.blend_tiles_pallas_flat(sorted_elems, ranges, fr, config)
    )()
    da = np.asarray(img_a)
    db = np.asarray(img_b)
    print(f"tile-vs-flat max|diff|: {np.abs(da - db).max():.3e}", flush=True)
    qa = (da * 255 + 0.5).astype(np.uint8)
    print(f"frame digest: {int(qa.sum())} nonzero={int((qa.sum(-1) > 0).sum())}",
          flush=True)


if __name__ == "__main__":
    main()
