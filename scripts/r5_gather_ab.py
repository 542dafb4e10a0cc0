"""A/B the r5 single-width-6 feature gather vs the r4 two-width-4 split,
with the REAL downstream (unpack + features_from_rows) attached — the r4
width probe consumed only [:8,:] of the gather output, which may not
represent the fused pipeline cost.

Usage: scripts/tpu_run.sh /tmp/gab.txt 2400 500 2 -- python -u scripts/r5_gather_ab.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

E = 6_270_464
N = 5_834_784
BK = 768


def bench(name, f, *xargs, iters=6):
    def run(n):
        d = None
        for i in range(n):
            d = f(jnp.float32(i) * jnp.float32(1e-6), *xargs)
        return float(d)

    t0 = time.perf_counter(); run(1); c = time.perf_counter() - t0
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(iters + 1); tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / iters * 1e3:.2f} ms (first {c:.1f}s)",
          flush=True)


rng = np.random.default_rng(7)
gid = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
live = jnp.asarray(rng.random(E).astype(np.float32) < 0.9).astype(jnp.float32)
t6 = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
ta = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
tb = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))


def digest(feat):
    return jnp.sum(feat[:, ::513])


# (a) production r5: one w6 gather + unpack + features_from_rows
def g_w6_full(s, t6, gid, live):
    rows = bk.rows_from_table6(jnp.take(t6, gid, axis=0, mode="clip"))
    feat = bk.features_from_rows(rows, live, BK)
    return digest(feat) + s * 0


# (b) production r4: two w4 gathers + reassemble + features_from_rows
def g_2w4_full(s, ta, tb, gid, live):
    rows = bk.rows_from_tables2(
        jnp.take(ta, gid, axis=0, mode="clip"),
        jnp.take(tb, gid, axis=0, mode="clip"),
    )
    feat = bk.features_from_rows(rows, live, BK)
    return digest(feat) + s * 0


# (c) raw w6 gather, whole output consumed (no unpack)
def g_w6_raw(s, t6, gid):
    return jnp.sum(jnp.take(t6, gid, axis=0, mode="clip")) + s * 0


# (d) w6 gather with a barrier before the unpack (fusion split)
def g_w6_barrier(s, t6, gid, live):
    raw = jax.lax.optimization_barrier(
        jnp.take(t6, gid, axis=0, mode="clip")
    )
    feat = bk.features_from_rows(bk.rows_from_table6(raw), live, BK)
    return digest(feat) + s * 0


# (e) raw 2xw4, whole output consumed
def g_2w4_raw(s, ta, tb, gid):
    return (
        jnp.sum(jnp.take(ta, gid, axis=0, mode="clip"))
        + jnp.sum(jnp.take(tb, gid, axis=0, mode="clip"))
        + s * 0
    )


bench("w6 raw (full consume)", jax.jit(g_w6_raw), t6, gid)
bench("2xw4 raw (full consume)", jax.jit(g_2w4_raw), ta, tb, gid)
bench("w6 + unpack + features", jax.jit(g_w6_full), t6, gid, live)
bench("w6 + BARRIER + unpack + features", jax.jit(g_w6_barrier), t6, gid, live)
bench("2xw4 + unpack + features (r4 prod)", jax.jit(g_2w4_full), ta, tb, gid, live)

# ---- cross-program layout matrix (r5): pass_bench showed the production
# w6 gather at ~88-93 ms in-pipeline (the [N,8] cost) while the standalone
# param probe reads 43-48: the [N,6] array apparently crosses the program
# boundary in a padded/tiled layout.  Reproduce + find the fix.
src = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))


@jax.jit
def producer6(src):
    # capped_layout-shaped producer: concat + barrier -> [N, 6] output
    t = jnp.concatenate(
        [src[:, 0:2], src[:, 3:4], src[:, 5:6], src[:, 7:8], src[:, 9:10]],
        axis=-1,
    )
    return jax.lax.optimization_barrier(t)


@jax.jit
def producer6_flat(src):
    t = jnp.concatenate(
        [src[:, 0:2], src[:, 3:4], src[:, 5:6], src[:, 7:8], src[:, 9:10]],
        axis=-1,
    )
    return jax.lax.optimization_barrier(t).reshape(-1)


def g_w6_flat(s, t6f, gid, live):
    rows = bk.rows_from_table6(
        jnp.take(t6f.reshape(N, 6), gid, axis=0, mode="clip")
    )
    feat = bk.features_from_rows(rows, live, BK)
    return digest(feat) + s * 0


t6_prod = jax.block_until_ready(producer6(src))
bench("w6 CROSS-PROGRAM (producer output)", jax.jit(g_w6_full), t6_prod,
      gid, live)
t6_flat = jax.block_until_ready(producer6_flat(src))
bench("w6 cross-program FLAT [N*6] + reshape", jax.jit(g_w6_flat), t6_flat,
      gid, live)
t6_relay = jax.block_until_ready(jax.device_put(t6_prod))
bench("w6 cross-program + device_put relayout", jax.jit(g_w6_full),
      t6_relay, gid, live)


@jax.jit
def producer2(src):
    ta = jax.lax.optimization_barrier(src[:, 0:4] * 1.0)
    tb = jax.lax.optimization_barrier(src[:, 4:8] * 1.0)
    return ta, tb


ta_p, tb_p = jax.block_until_ready(producer2(src))
bench("2xw4 CROSS-PROGRAM (producer output)", jax.jit(g_2w4_full), ta_p,
      tb_p, gid, live)


# in-ONE-program: build table AND gather in the same jit
def g_w6_fused(s, src, gid, live):
    t = jnp.concatenate(
        [src[:, 0:2], src[:, 3:4], src[:, 5:6], src[:, 7:8], src[:, 9:10]],
        axis=-1,
    )
    t = jax.lax.optimization_barrier(t)
    rows = bk.rows_from_table6(jnp.take(t, gid, axis=0, mode="clip"))
    feat = bk.features_from_rows(rows, live, BK)
    return digest(feat) + s * 0


bench("w6 IN-GRAPH table (one program)", jax.jit(g_w6_fused), src, gid, live)


# w8-padded table, param (upper bound sanity)
t8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))


def g_w8(s, t8, gid):
    return jnp.sum(jnp.take(t8, gid, axis=0, mode="clip")) + s * 0


bench("w8 raw param", jax.jit(g_w8), t8, gid)
