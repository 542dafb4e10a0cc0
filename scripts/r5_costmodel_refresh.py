"""Re-derive the gather width curve and sort payload scaling on the
CURRENT server stack under the RELIABLE in-jit fori protocol (the r4
curve rows came from the flaky dispatch-loop protocol and at least the
w5/w6 row was an artifact).  Zero product risk — measurement only.

Usage: scripts/tpu_run.sh /tmp/cm.txt 3600 900 2 -- python -u scripts/r5_costmodel_refresh.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

E = 6_270_464
N = 5_834_784


def bench(name, f, *xargs, iters=12):
    def run(k, *a):
        def body(i, acc):
            return acc * jnp.float32(1e-30) + f(i, *a)

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    g = jax.jit(run)
    t0 = time.perf_counter(); float(g(jnp.int32(1), *xargs))
    c = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(1), *xargs))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(iters + 1), *xargs))
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / iters * 1e3:.2f} ms (first {c:.1f}s)",
          flush=True)


rng = np.random.default_rng(7)
idx = jnp.asarray(rng.integers(0, N - 2, E).astype(np.int32))

# ---- gather width curve, FULL output consumed, index perturbed per iter
for w in (1, 2, 4, 6, 8, 10):
    t = jnp.asarray(rng.normal(size=(N, w)).astype(np.float32))

    def g1(i, t, idx):
        # per-iteration index perturbation XLA cannot fold away
        return jnp.sum(jnp.take(t, idx + (i & 1), axis=0, mode="clip"))

    bench(f"gather w{w} 6.27M (fori, full consume)", g1, t, idx)
    del t

# two width-4 gathers in one program (the production shape)
ta = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
tb = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))


def g2(i, ta, tb, idx):
    j = idx + (i & 1)
    return jnp.sum(jnp.take(ta, j, axis=0, mode="clip")) + jnp.sum(
        jnp.take(tb, j, axis=0, mode="clip")
    )


bench("2x w4 gather 6.27M (one program)", g2, ta, tb, idx)

# ---- sort payload scaling at steady capacity (transport pricing)
CAP = 7_660_032
keys_t = jnp.asarray(rng.integers(0, 8160, CAP).astype(np.uint16))
keys_d = jnp.asarray(rng.integers(0, 2**32, CAP, dtype=np.uint64).astype(np.uint32))
keys_i = jnp.asarray(np.arange(CAP, dtype=np.uint32))
pay = [
    jnp.asarray(rng.integers(0, 2**32, CAP, dtype=np.uint64).astype(np.uint32))
    for _ in range(4)
]

for k in (0, 2, 4):
    ops = [keys_t, keys_d, keys_i] + pay[:k]

    def s3(i, *ops):
        o = (ops[0], ops[1] + (i & 1).astype(jnp.uint32)) + ops[2:]
        out = lax.sort(o, dimension=0, num_keys=3)
        return sum(jnp.sum(x[:8].astype(jnp.float32)) for x in out)

    bench(f"3-key sort @7.66M + {k} u32 payload cols", s3, *ops)
