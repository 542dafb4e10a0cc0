"""Gather width anchors (w1..w6, w4+w3 pairs, row-count scaling) — r4.

Usage: scripts/tpu_run.sh /tmp/width.txt 1800 400 2 -- python -u scripts/r4_width_probe.py
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
idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
for w in (1, 2, 3, 4, 5, 6):
    t = jnp.asarray(rng.normal(size=(N, w)).astype(np.float32))
    bench(f"w{w} gather 6.27M", jax.jit(g1), t, idx)
    del t
# two-gather combos in one program
def g2(s, ta, tb, idx):
    ra = jnp.take(ta, idx, axis=0, mode="clip")
    rb = jnp.take(tb, idx, axis=0, mode="clip")
    return jnp.sum(ra[:8, :]) + jnp.sum(rb[:8, :]) + s * 0
t4 = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
t3 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
bench("w4+w3 one program", jax.jit(g2), t4, t3, idx)
# smaller row count anchor (occupancy lever)
idx5 = jnp.asarray(rng.integers(0, N, 5_210_112).astype(np.int32))
bench("w4 gather 5.21M", jax.jit(g1), t4, idx5)
