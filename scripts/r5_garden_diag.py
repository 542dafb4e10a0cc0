"""Garden steady-frame divergence diagnosis (r5 image check).

Drives the production ChainedTemporalPlan at garden exactly like bench.py,
then at eps=0: renders a FULL-mode (unfiltered) frame and a run of steady
frames, printing ok/stats per frame and saving both images for offline
comparison against the CPU reference.

Usage: scripts/tpu_run.sh /tmp/gdiag.txt 4200 1200 2 -- python -u scripts/r5_garden_diag.py
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
from vk3dgaussiansplatting_tpu.io.image import write_png
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
from vk3dgaussiansplatting_tpu.ops import blend as bl
from vk3dgaussiansplatting_tpu.pipeline import ChainedTemporalPlan

args = argparse.Namespace(
    scene="garden30k_1080p", seed=42, scene_gen="cloud",
    opacity_mode="capture", sort="xla", slack=None, packed_slack=None,
    bk=None, thr_margin=None, cap=384, cap_max=4096, blend="capped",
    no_pallas=False,
)
cfg = bench.build_config(args, "garden30k_1080p", "capped")
cap = cfg.sort_capacity(5_834_784)
ht, cam, mult, _ = bench.build_scene(args, "garden30k_1080p", cfg, cap)
table = jax.device_put(
    GaussianTable(
        position=jnp.asarray(ht.position),
        scale=jnp.asarray(ht.scale * np.float32(mult)),
        rot=jnp.asarray(ht.rot),
        sh=jnp.asarray(ht.sh),
        opacity=jnp.asarray(ht.opacity),
    )
)
del ht
view, proj = cam.matrices()
pj = jnp.asarray(proj)
cj = jnp.asarray(cam.position, dtype=jnp.float32)
v0 = jax.device_put(jnp.asarray(np.array(view, dtype=np.float32)))
q8 = jax.jit(bl.quantize_image)

plan = ChainedTemporalPlan(cfg, cap, steady_frac=0.48, log=print)

# warmup exactly like bench (14 frames, eps sweep)
_vcache = {}


def vof(eps):
    k = float(np.float32(eps))
    if k not in _vcache:
        v = np.array(view, dtype=np.float32)
        v[2, 3] += np.float32(k)
        _vcache[k] = jax.device_put(jnp.asarray(v))
    return _vcache[k]


for i in range(14):
    plan.frame(table, vof(i * 1e-5), pj, cj)
print("warmup done", flush=True)

# FULL-mode frame at eps=0 (unfiltered, caps converged)
img_full = plan.frame(table, v0, pj, cj)
u8_full = np.asarray(q8(img_full))
st = [int(x) for x in np.asarray(plan.last_stats)]
print("FULL frame ok:", bool(plan.last_ok), "stats:", st,
      "count:", int(plan.last_count), flush=True)
write_png("artifacts/gdiag_full.png", u8_full)

plan.try_steady_switch(table, vof(2.0e-4), pj, cj)
print("mode:", plan.mode, flush=True)

# Replicate the bench history: blocks of eps-cycled frames (the camera
# jumps back to eps 0 at each block start), then the settle sequence.
for b in range(4):
    for i in range(13):
        plan.frame(table, vof(i * 1e-5), pj, cj)
print("blocks done", flush=True)

for i in range(10):
    img_s = plan.frame(table, v0, pj, cj)
    st = [int(x) for x in np.asarray(plan.last_stats)]
    print(f"steady {i}: ok={bool(plan.last_ok)} stats={st} "
          f"count={int(plan.last_count)} "
          f"ovf={bool(plan.last_overflow) if plan.last_overflow is not None else None}",
          flush=True)
u8_s = np.asarray(q8(img_s))
write_png("artifacts/gdiag_steady.png", u8_s)

d = np.abs(u8_full[..., :3].astype(int) - u8_s[..., :3].astype(int))
print("steady vs full (TPU): max", d.max(), "mean", round(float(d.mean()), 3),
      flush=True)
ref = np.load(
    "/root/.cache/vk3dgs_ref_garden30k_1080p-42-cloud-capture-14190624-xla-e0-v1.npy"
)
for nm, u in (("full", u8_full), ("steady", u8_s)):
    d = np.abs(u[..., :3].astype(int) - ref[..., :3].astype(int))
    print(f"TPU {nm} vs CPU ref: max {d.max()} mean {float(d.mean()):.3f} "
          f"frac>16 {(d > 16).any(-1).mean():.4f}", flush=True)
