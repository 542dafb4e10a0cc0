"""Concatenated/batched gather probes (one big vs two small) — r4.

Usage: scripts/tpu_run.sh /tmp/catg.txt 1800 400 2 -- python -u scripts/r4_catgather_probe.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")
E = 6_270_464; N = 5_834_784
def bench(name, f, *xargs, iters=6):
    def run(n):
        d = None
        for i in range(n): d = f(jnp.float32(i) * jnp.float32(1e-6), *xargs)
        return float(d)
    t0=time.perf_counter(); run(1); c=time.perf_counter()-t0
    t0=time.perf_counter(); run(1); t1=time.perf_counter()-t0
    t0=time.perf_counter(); run(iters+1); tn=time.perf_counter()-t0
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms (first {c:.1f}s)", flush=True)
def g1(s, t, idx):
    return jnp.sum(jnp.take(t, idx, axis=0, mode="clip")[:8, :]) + s * 0
rng = np.random.default_rng(7)
t4 = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
bench("w4 6.27M idx (anchor)", jax.jit(g1), t4, idx)
# same table, doubled index list (two logical gathers in one op)
idx2 = jnp.concatenate([idx, idx])
bench("w4 12.54M idx, same table", jax.jit(g1), t4, idx2)
# concatenated twin table, doubled+offset idx (the real 2-table fetch)
t8cat = jnp.concatenate([t4, jnp.asarray(rng.normal(size=(N,4)).astype(np.float32))])
idx_off = jnp.concatenate([idx, idx + jnp.int32(N)])
bench("w4 12.54M idx, 11.7M-row cat table", jax.jit(g1), t8cat, idx_off)
# idx-count scaling fine-grain
for m in (2_097_152, 3_145_728, 4_194_304):
    idx_m = jnp.asarray(rng.integers(0, N, m).astype(np.int32))
    bench(f"w4 {m/1e6:.1f}M idx", jax.jit(g1), t4, idx_m)
