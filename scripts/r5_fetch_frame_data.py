"""Fetch the TPU-computed sorted elements + frame data for train7k to
host storage, so the CPU reference blend can run on TPU-COMPUTED inputs —
separating blend-tier divergence from keygen transcendental divergence
(r5 image-check bar justification).

Usage: scripts/tpu_run.sh /tmp/fetch.txt 2400 600 2 -- python -u scripts/r5_fetch_frame_data.py
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

import bench
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
from vk3dgaussiansplatting_tpu.ops import blend as bl
from vk3dgaussiansplatting_tpu.ops import keygen as kg
from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel

args = argparse.Namespace(
    scene="train7k_720p", seed=42, scene_gen="cloud", opacity_mode="capture",
    sort="xla", slack=None, packed_slack=None, bk=None, thr_margin=None,
    cap=384, cap_max=4096, blend="capped", no_pallas=False,
)
cfg = bench.build_config(args, "train7k_720p", "capped")
cap = cfg.sort_capacity(559_263)
ht, cam, mult, _ = bench.build_scene(args, "train7k_720p", cfg, cap)
table = jax.device_put(
    GaussianTable(
        position=jnp.asarray(ht.position),
        scale=jnp.asarray(ht.scale * np.float32(mult)),
        rot=jnp.asarray(ht.rot),
        sh=jnp.asarray(ht.sh),
        opacity=jnp.asarray(ht.opacity),
    )
)
view, proj = cam.matrices()
el, fr = jax.jit(
    lambda t, v, p, c: kg.generate_sort_elements(t, v, p, c, cfg, cap)
)(table, jnp.asarray(view), jnp.asarray(proj),
  jnp.asarray(cam.position, dtype=jnp.float32))
el = jax.jit(lambda e: sort_ops.sort_elements(e, cfg))(el)
rg = jax.jit(lambda e: ranges_ops.find_ranges(e, cfg.num_tiles))(el)
img = jax.jit(
    lambda e, r, f: blend_kernel.blend_tiles_pallas_flat(e, r, f, cfg)
)(el, rg, fr)
u8 = np.asarray(jax.jit(bl.quantize_image)(img))
np.savez_compressed(
    "/root/.cache/vk3dgs_tpu_frame_train7k.npz",
    tile=np.asarray(el.tile), depth=np.asarray(el.depth),
    index=np.asarray(el.index), count=np.asarray(el.count),
    ranges=np.asarray(rg),
    screen_pos=np.asarray(fr.screen_pos),
    color_alpha=np.asarray(fr.color_alpha),
    cov_inv=np.asarray(fr.cov_inv),
    img_u8=u8,
)
print("saved /root/.cache/vk3dgs_tpu_frame_train7k.npz", flush=True)
