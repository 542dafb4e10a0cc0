"""Does pack_feature_tables2 + rows_from_tables2 round-trip ON DEVICE?
(r5 image-check failure bisect: TPU capped image has channel-level
corruption; the f16 rg/b0 pack words are the capped path's only
color-affecting difference vs the near-correct flat path.)

Usage: scripts/tpu_run.sh /tmp/pack.txt 1800 400 2 -- python -u scripts/r5_pack_probe.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.keygen import GaussianFrameData
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

n = 100_000
rng = np.random.default_rng(3)
frame = GaussianFrameData(
    color_alpha=jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32)),
    cov2d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
    cov_inv=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
    screen_pos=jnp.asarray(rng.uniform(-500, 2500, (n, 2)).astype(np.float32)),
)
idx = jnp.asarray(np.arange(n, dtype=np.int32))


@jax.jit
def wide_rows(frame):
    return bk.pack_feature_table(frame)


@jax.jit
def split_rows(frame, idx):
    ta, tb = bk.pack_feature_tables2(frame)
    return bk.rows_from_tables2(
        jnp.take(ta, idx, axis=0, mode="clip"),
        jnp.take(tb, idx, axis=0, mode="clip"),
    )


w = np.asarray(wide_rows(frame))
s = np.asarray(split_rows(frame, idx))
print("wide   sample:", w[0], flush=True)
print("split  sample:", s[0], flush=True)
for col in (0, 1, 2, 3, 4, 5, 9):
    eq = np.array_equal(s[:, col], w[:, col])
    print(f"col {col} exact: {eq}", flush=True)
for col in (6, 7, 8):
    d = np.abs(s[:, col] - w[:, col])
    print(f"col {col} (f16 rgb): max err {d.max():.6f}", flush=True)

# also probe the raw pack16 word on a known pattern
x = jnp.asarray(np.array([0.25, 0.5, 1.0, 0.625], np.float32))
y = jnp.asarray(np.array([0.75, 1.5, 2.0, 0.125], np.float32))
word = jax.jit(bk._pack16)(x, y)
lo, hi = jax.jit(bk._unpack16)(word)
print("pack16 roundtrip lo:", np.asarray(lo), flush=True)
print("pack16 roundtrip hi:", np.asarray(hi), flush=True)
bits = np.asarray(
    jax.jit(lambda w: jax.lax.bitcast_convert_type(w, jnp.uint32))(word)
)
print("word bits:", [hex(b) for b in bits], flush=True)
