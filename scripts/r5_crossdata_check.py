"""Run the CPU f64 reference blend on TPU-COMPUTED element/frame data and
diff against the TPU's own render of the same data — isolates blend-tier
divergence from keygen transcendental divergence (r5).

Run on CPU: python -u scripts/r5_crossdata_check.py
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import bench
from vk3dgaussiansplatting_tpu.ops import blend as bl
from vk3dgaussiansplatting_tpu.ops.keygen import GaussianFrameData, SortElements

z = np.load("/root/.cache/vk3dgs_tpu_frame_train7k.npz")
args = argparse.Namespace(
    scene="train7k_720p", seed=42, scene_gen="cloud", opacity_mode="capture",
    sort="xla", slack=None, packed_slack=None, bk=None, thr_margin=None,
    cap=384, cap_max=4096, blend="capped", no_pallas=False,
)
cfg = bench.build_config(args, "train7k_720p", "capped")

el = SortElements(
    tile=jnp.asarray(z["tile"]), depth=jnp.asarray(z["depth"]),
    index=jnp.asarray(z["index"]), count=jnp.asarray(z["count"]),
)
fr = GaussianFrameData(
    color_alpha=jnp.asarray(z["color_alpha"]),
    cov2d=jnp.zeros_like(jnp.asarray(z["cov_inv"])),
    cov_inv=jnp.asarray(z["cov_inv"]),
    screen_pos=jnp.asarray(z["screen_pos"]),
)
rg = jnp.asarray(z["ranges"])
img = bench._blend_strips_chunked(el, rg, fr, cfg)
u8_ref = np.asarray(bl.quantize_image(jnp.asarray(img).astype(jnp.float32)))
u8_tpu = z["img_u8"]
d = np.abs(u8_ref[..., :3].astype(int) - u8_tpu[..., :3].astype(int))
print("CPU-ref(TPU data) vs TPU render: max", d.max(),
      "mean", round(float(d.mean()), 4),
      "frac>1", round(float((d > 1).any(-1).mean()), 5),
      "frac>16", round(float((d > 16).any(-1).mean()), 5), flush=True)

# and vs the CPU-data reference (the production image check's ref)
ref_cpu = np.load(
    "/root/.cache/vk3dgs_ref_train7k_720p-42-cloud-capture-4245663-xla-e0-v3.npy"
)
d2 = np.abs(u8_ref[..., :3].astype(int) - ref_cpu[..., :3].astype(int))
print("CPU-ref(TPU data) vs CPU-ref(CPU data): max", d2.max(),
      "mean", round(float(d2.mean()), 4),
      "frac>16", round(float((d2 > 16).any(-1).mean()), 5), flush=True)
