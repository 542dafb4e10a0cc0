"""TPU-vs-CPU frame divergence diagnosis (r5 image-check failure).

Renders train7k on the TPU via the production monolithic capped path AND
the uncapped flat pallas path, fetches the sorted element arrays and the
frame data digests, and saves both images — so the divergence the bench
image check caught (mean |d| ~57 vs the CPU XLA reference) can be pinned
to keygen/sort (integer artifacts) vs frame data (colors/cov) vs blend.

Usage: scripts/tpu_run.sh /tmp/imgdiag.txt 3000 600 2 -- python -u scripts/r5_imgdiag.py
"""
import argparse
import hashlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

import bench
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
from vk3dgaussiansplatting_tpu.ops import blend as bl
from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
from vk3dgaussiansplatting_tpu.ops import keygen as kg
from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
from vk3dgaussiansplatting_tpu.io.image import write_png

args = argparse.Namespace(
    scene="train7k_720p", seed=42, scene_gen="cloud", opacity_mode="capture",
    sort="xla", slack=None, packed_slack=None, bk=None, thr_margin=None,
    cap=384, cap_max=4096, blend="capped", no_pallas=False,
)
cfg = bench.build_config(args, "train7k_720p", "capped")
cap = cfg.sort_capacity(559_263)
ht, cam, mult, _ = bench.build_scene(args, "train7k_720p", cfg, cap)
print("mult", mult, flush=True)
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
vj, pj, cj = (
    jnp.asarray(view), jnp.asarray(proj),
    jnp.asarray(cam.position, dtype=jnp.float32),
)

kgj = jax.jit(lambda t, v, p, c: kg.generate_sort_elements(t, v, p, c, cfg, cap))
soj = jax.jit(lambda el: sort_ops.sort_elements(el, cfg))
rgj = jax.jit(lambda el: ranges_ops.find_ranges(el, cfg.num_tiles))

el, fr = kgj(table, vj, pj, cj)
el = soj(el)
rg = rgj(el)


def h(x):
    return hashlib.md5(np.asarray(x).tobytes()).hexdigest()[:12]


print("count:", int(el.count), flush=True)
print("tile md5:", h(el.tile), flush=True)
print("depth md5:", h(el.depth), flush=True)
print("index md5:", h(el.index), flush=True)
print("ranges md5:", h(rg), flush=True)
for name, arr in (
    ("color_alpha", fr.color_alpha),
    ("cov_inv", fr.cov_inv),
    ("screen_pos", fr.screen_pos),
):
    a = np.asarray(arr)
    print(f"{name}: md5 {h(a)} mean {a.mean(0)}", flush=True)

# uncapped flat pallas blend
img_flat = jax.jit(
    lambda el, rg, fr: blend_kernel.blend_tiles_pallas_flat(el, rg, fr, cfg)
)(el, rg, fr)
u8_flat = np.asarray(jax.jit(bl.quantize_image)(img_flat))
write_png("artifacts/imgdiag_train_tpu_flat.png", u8_flat)

# production monolithic capped temporal (a few frames to converge caps)
caps = capped_ops.init_caps(cfg)
cappedj = jax.jit(
    lambda el, rg, fr, c: capped_ops.blend_tiles_capped_temporal(
        el, rg, fr, cfg, c
    )
)
for i in range(4):
    img_cap, caps, ok = cappedj(el, rg, fr, caps)
u8_cap = np.asarray(jax.jit(bl.quantize_image)(img_cap))
print("capped ok:", bool(ok), flush=True)
write_png("artifacts/imgdiag_train_tpu_capped.png", u8_cap)

d = np.abs(u8_flat[..., :3].astype(int) - u8_cap[..., :3].astype(int))
print("flat vs capped on TPU: max", d.max(), "mean", d.mean(), flush=True)

ref = np.load(
    "/root/.cache/vk3dgs_ref_train7k_720p-42-cloud-capture-4245663-xla-e0-v1.npy"
)
for nm, u8 in (("flat", u8_flat), ("capped", u8_cap)):
    d = np.abs(u8[..., :3].astype(int) - ref[..., :3].astype(int))
    print(f"TPU {nm} vs CPU ref: max {d.max()} mean {d.mean():.3f} "
          f"frac>1 {(d > 1).any(-1).mean():.4f}", flush=True)
print("saved artifacts/imgdiag_train_tpu_{flat,capped}.png", flush=True)
