"""Full-pipeline smoke + timing on the real TPU chip.

Renders a benchmark-scale procedural scene through the jitted frame function
(Pallas blend tier) and times passes with the in-jit loop protocol (the tunnel
hides completion otherwise — see scripts/micro_bench.py).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
from vk3dgaussiansplatting_tpu.render.camera import Camera
from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_cloud_table


def timed_loop(fn, iters=5):
    """fn(scalar) -> scalar digest; amortized in-jit timing."""

    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-30) + fn(acc * jnp.float32(1e-30))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run)  # dynamic trip count: one compile for both calls
    one, many = jnp.int32(1), jnp.int32(iters + 1)
    float(g(one))
    t0 = time.perf_counter()
    float(g(one))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(g(many))
    tn = time.perf_counter() - t0
    return (tn - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--sort", default="xla", choices=["xla", "radix"])
    args = ap.parse_args()

    config = RenderConfig(
        width=args.width,
        height=args.height,
        sort_algorithm=SortAlgorithm.XLA_SORT
        if args.sort == "xla"
        else SortAlgorithm.RADIX,
    )
    print("building scene...", flush=True)
    host_table = procedural_cloud_table(args.gaussians, seed=42)
    cam = Camera(config.aspect)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(np.pi, 0.0)
    view, proj = cam.matrices()

    table = jax.device_put(
        GaussianTable(*[jnp.asarray(x) for x in (
            host_table.position, host_table.scale, host_table.rot,
            host_table.sh, host_table.opacity)])
    )
    capacity = config.sort_capacity(args.gaussians)
    print(f"capacity={capacity} tiles={config.num_tiles}", flush=True)
    viewj, projj, camj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)

    kg = jax.jit(
        lambda s: keygen_ops.generate_sort_elements(
            jax.tree.map(lambda x: x + s * 0, table), viewj, projj, camj, config, capacity
        )
    )
    elements, frame = kg(jnp.float32(0.0))
    n_elem = int(elements.count)
    print(f"live elements: {n_elem} ({n_elem/1e6:.2f} M)", flush=True)

    t = timed_loop(
        lambda s: jnp.sum(
            kg(s)[0].depth[:16].astype(jnp.float32)
        ),
        iters=5,
    )
    print(f"keygen: {t*1e3:.2f} ms", flush=True)

    sorted_elems = sort_ops.sort_elements(elements, config)
    jax.block_until_ready(sorted_elems)

    def sort_digest(s):
        el = keygen_ops.SortElements(
            tile=elements.tile,
            depth=elements.depth + s.astype(jnp.uint32),
            index=elements.index,
            count=elements.count,
        )
        se = sort_ops.sort_elements(el, config)
        return jnp.sum(se.index[:16].astype(jnp.float32))

    t = timed_loop(sort_digest, iters=3)
    print(f"sort ({args.sort}): {t*1e3:.2f} ms", flush=True)

    ranges = ranges_ops.find_ranges(sorted_elems, config.num_tiles)
    t = timed_loop(
        lambda s: jnp.sum(
            ranges_ops.find_ranges(
                keygen_ops.SortElements(
                    tile=sorted_elems.tile,
                    depth=sorted_elems.depth,
                    index=sorted_elems.index + s.astype(jnp.uint32),
                    count=sorted_elems.count,
                ),
                config.num_tiles,
            )[:16, :].astype(jnp.float32)
        ),
        iters=5,
    )
    print(f"find_ranges: {t*1e3:.2f} ms", flush=True)

    img = blend_kernel.blend_tiles_pallas(sorted_elems, ranges, frame, config)
    im = np.asarray(img)
    print(f"blend image: shape={im.shape} mean={im.mean():.4f} lit={(im.sum(-1)>0).mean():.3f}", flush=True)

    def blend_digest(s):
        fr = keygen_ops.GaussianFrameData(
            color_alpha=frame.color_alpha + s,
            cov2d=frame.cov2d,
            cov_inv=frame.cov_inv,
            screen_pos=frame.screen_pos,
        )
        out = blend_kernel.blend_tiles_pallas(sorted_elems, ranges, fr, config)
        return jnp.sum(out[:4, :4, :])

    t = timed_loop(blend_digest, iters=3)
    print(f"pallas blend (incl feature gather): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
