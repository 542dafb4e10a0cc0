"""Localize the on-device blue-channel corruption: is table_b's b0 word
wrong at BUILD (pack/concat), or does the unpack/bitcast of the gathered
slice corrupt it?  Also test unpack variants for the fix.

Usage: scripts/tpu_run.sh /tmp/pack2.txt 1800 400 2 -- python -u scripts/r5_pack_probe2.py
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

n = 4096
rng = np.random.default_rng(3)
ca = rng.uniform(0, 1, (n, 4)).astype(np.float32)
frame = GaussianFrameData(
    color_alpha=jnp.asarray(ca),
    cov2d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
    cov_inv=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
    screen_pos=jnp.asarray(rng.uniform(-500, 2500, (n, 2)).astype(np.float32)),
)


@jax.jit
def tables(frame):
    return bk.pack_feature_tables2(frame)


ta, tb = tables(frame)
tb_h = np.asarray(tb)
bits = tb_h[:, 3].view(np.uint32)
want_b16 = ca[:, 2].astype(np.float16).view(np.uint16).astype(np.uint32)
got_lo = bits & 0xFFFF
got_hi = bits >> 16
print("b0 word LO == f16(b):", np.array_equal(got_lo, want_b16), flush=True)
print("b0 word HI == 0:", (got_hi == 0).all(), flush=True)
rg_bits = tb_h[:, 2].view(np.uint32)
want_r16 = ca[:, 0].astype(np.float16).view(np.uint16).astype(np.uint32)
want_g16 = ca[:, 1].astype(np.float16).view(np.uint16).astype(np.uint32)
print("rg word LO == f16(r):", np.array_equal(rg_bits & 0xFFFF, want_r16),
      flush=True)
print("rg word HI == f16(g):", np.array_equal(rg_bits >> 16, want_g16),
      flush=True)
bad = np.nonzero(got_lo != want_b16)[0]
print("bad b rows:", bad[:5], "of", len(bad), flush=True)
if len(bad):
    i = int(bad[0])
    print("row", i, "bits", hex(bits[i]), "want lo", hex(int(want_b16[i])),
          flush=True)

# unpack side on the DEVICE-built table (even if build is wrong, compare
# against the table content so the unpack is judged separately)
idx = jnp.asarray(np.arange(n, dtype=np.int32))


@jax.jit
def unpack_prod(tb, idx):
    rows_b = jnp.take(tb, idx, axis=0, mode="clip")
    packed = jax.lax.bitcast_convert_type(rows_b[:, 2:4], jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (packed & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (packed >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    return lo, hi


@jax.jit
def unpack_cols(tb, idx):
    rows_b = jnp.take(tb, idx, axis=0, mode="clip")
    lo2, hi2 = bk._unpack16(rows_b[:, 2])
    lo3, hi3 = bk._unpack16(rows_b[:, 3])
    return jnp.stack([lo2, lo3], -1), jnp.stack([hi2, hi3], -1)


lo_p, hi_p = [np.asarray(x) for x in unpack_prod(tb, idx)]
lo_c, hi_c = [np.asarray(x) for x in unpack_cols(tb, idx)]
ref_lo = np.stack(
    [(rg_bits & 0xFFFF), got_lo], -1
).astype(np.uint16).view(np.float16).astype(np.float32)
ref_hi = np.stack(
    [(rg_bits >> 16), got_hi], -1
).astype(np.uint16).view(np.float16).astype(np.float32)
print("prod 2col-slice unpack lo ok:", np.array_equal(lo_p, ref_lo), flush=True)
print("prod 2col-slice unpack hi ok:", np.array_equal(hi_p, ref_hi), flush=True)
print("per-col unpack lo ok:", np.array_equal(lo_c, ref_lo), flush=True)
print("per-col unpack hi ok:", np.array_equal(hi_c, ref_hi), flush=True)
if not np.array_equal(lo_p, ref_lo):
    bad = np.nonzero((lo_p != ref_lo).any(-1))[0]
    i = int(bad[0])
    print("unpack bad row", i, "got", lo_p[i], "want", ref_lo[i], flush=True)
