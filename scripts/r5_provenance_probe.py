"""Pin down the gather table-PROVENANCE penalty (r5 cost-model refresh):
a w6 gather from a device_put table costs 43 ms; from the in-pipeline
capped_layout output ~92.  Which producer property mediates it?

Variants (all timed with the reliable in-jit fori protocol):
  A. device_put table (control, expect ~43)
  B. single-output producer jit: concat+barrier -> t6
  C. multi-output producer jit (capped_layout-shaped: t6 + 4 other arrays)
  D. producer WITHOUT the optimization_barrier
  E. w4 pair from the same multi-output producer (control, expect ~66)

Usage: scripts/tpu_run.sh /tmp/prov.txt 2400 600 2 -- python -u scripts/r5_provenance_probe.py
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
src = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))


def g6(i, t, idx):
    return jnp.sum(jnp.take(t, idx + (i & 1), axis=0, mode="clip"))


# A: device_put control
tA = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
bench("A w6 from device_put", g6, tA, idx)
del tA


def make_t6(src):
    return jnp.concatenate(
        [src[:, 0:2], src[:, 3:4], src[:, 5:6], src[:, 7:8], src[:, 9:10]],
        axis=-1,
    )


# B: single-output producer
tB = jax.block_until_ready(
    jax.jit(lambda s: jax.lax.optimization_barrier(make_t6(s)))(src)
)
bench("B w6 from single-output producer", g6, tB, idx)
del tB

# C: multi-output producer (capped_layout-shaped)
@jax.jit
def producer_multi(src):
    t6 = jax.lax.optimization_barrier(make_t6(src))
    a = jnp.cumsum(src[:, 10])
    b = src[:, 11] * 2.0
    c = jnp.sum(src[:, 0])
    return t6, a, b, c


outs = jax.block_until_ready(producer_multi(src))
tC = outs[0]
bench("C w6 from multi-output producer", g6, tC, idx)
del tC, outs

# D: producer without barrier
tD = jax.block_until_ready(jax.jit(make_t6)(src))
bench("D w6 from producer, NO barrier", g6, tD, idx)
del tD

# E: w4 pair from a multi-output producer (production shape control)
@jax.jit
def producer_pair(src):
    ta = jax.lax.optimization_barrier(src[:, 0:4] * 1.0)
    tb = jax.lax.optimization_barrier(src[:, 4:8] * 1.0)
    a = jnp.cumsum(src[:, 10])
    return ta, tb, a


ta, tb, _ = jax.block_until_ready(producer_pair(src))


def g44(i, ta, tb, idx):
    j = idx + (i & 1)
    return jnp.sum(jnp.take(ta, j, axis=0, mode="clip")) + jnp.sum(
        jnp.take(tb, j, axis=0, mode="clip")
    )


bench("E 2x w4 from multi-output producer", g44, ta, tb, idx)


# ---- consumer-side variants: the production downstream is
# rows_from_table6 + features_from_rows ([E,10] -> [16,E] transpose);
# its fusion INTO the gather may be the real mediator of the production
# w6 regression (all producer variants measure equal).
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

live = jnp.asarray(
    (rng.random(E) < 0.9).astype(np.float32)
)
t6 = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))


def digest(feat):
    return jnp.sum(feat[:, ::513])


def gF(i, t6, idx, live):
    rows = bk.rows_from_table6(
        jnp.take(t6, idx + (i & 1), axis=0, mode="clip")
    )
    return digest(bk.features_from_rows(rows, live, 768))


bench("F w6 + unpack + features (fused)", gF, t6, idx, live)


def gG(i, t6, idx, live):
    raw = jax.lax.optimization_barrier(
        jnp.take(t6, idx + (i & 1), axis=0, mode="clip")
    )
    return digest(
        bk.features_from_rows(bk.rows_from_table6(raw), live, 768)
    )


bench("G w6 + BARRIER + unpack + features", gG, t6, idx, live)


def gH(i, ta, tb, idx, live):
    j = idx + (i & 1)
    rows = bk.rows_from_tables2(
        jnp.take(ta, j, axis=0, mode="clip"),
        jnp.take(tb, j, axis=0, mode="clip"),
    )
    return digest(bk.features_from_rows(rows, live, 768))


bench("H 2x w4 + unpack + features (production)", gH, ta, tb, idx, live)
