"""Blend-core cost split: is the exclusive cumprod the bound, or the
f/alpha evaluation?  Knocks out the cumprod (identity transmittance) and
times blend_flat_core at garden steady shapes — informs the next-round
lever ranking (docs/PERFORMANCE.md r4 close).

Usage: scripts/tpu_run.sh /tmp/blend_split.txt 1800 500 2 -- \
           python -u scripts/r4_blend_split.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.core.config import RenderConfig
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

E = 6_270_464
T = 8160
config = RenderConfig(width=1920, height=1080, capacity_pow_two=False)


def bench(name, f, *xargs, iters=5):
    def run(n):
        d = None
        for i in range(n):
            d = f(jnp.float32(i) * jnp.float32(1e-9), *xargs)
        return float(d)
    t0 = time.perf_counter(); run(1); c = time.perf_counter() - t0
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters + 1); tn = time.perf_counter() - t0
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms (first {c:.1f}s)", flush=True)


def main():
    rng = np.random.default_rng(7)
    feat = jnp.asarray(
        rng.normal(size=(bk.NUM_FEATURES, E + 2048)).astype(np.float32)
    )
    counts = np.minimum(rng.integers(0, 1024, T), 640).astype(np.int32)
    off = np.zeros(T, np.int32)
    slabw = -(-counts // 128) * 128
    pcum = np.cumsum(slabw)
    sbase = (pcum - slabw).astype(np.int32)
    pr = np.stack([sbase, sbase + counts], axis=1).astype(np.uint32)
    pr_j = jnp.asarray(pr)

    def digest(s, feat, pr):
        img, t = bk.blend_flat_core(
            feat + s, pr, config, E, with_t=True
        )
        return jnp.sum(img[::97, ::97, 0]) + jnp.sum(t[::97, ::97])

    bench("blend_flat_core baseline", jax.jit(digest), feat, pr_j)

    real = bk._exclusive_cumprod_lanes
    bk._exclusive_cumprod_lanes = lambda q: jnp.ones_like(q)
    bench("blend_flat_core NO-cumprod", jax.jit(digest), feat, pr_j)
    bk._exclusive_cumprod_lanes = real


if __name__ == "__main__":
    main()
