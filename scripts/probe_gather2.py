"""Second Mosaic dynamic-gather probe — shape/rank variants.

The first probe's jnp.take calls failed on MY shape bug before reaching
Mosaic.  Try the documented-adjacent forms: take with 1-D loaded indices,
take_along_axis with matching ranks, gather along sublanes vs lanes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
K = 1024
C = 128


def probe(name, kernel, args, out_shape):
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        r = np.asarray(f(*args))
        print(f"{name}: OK result_checksum={r.sum():.1f}", flush=True)
        return f
    except Exception as e:
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def bench(name, f, args, iters=30):
    if f is None:
        return
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + jnp.sum(f(*args)) * jnp.float32(1e-20) + jnp.float32(1.0)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    g = jax.jit(run)
    float(g(jnp.int32(1)))
    t0 = time.perf_counter(); float(g(jnp.int32(1))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(iters + 1))); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e6:.1f} us -> {K/dt/1e6:.1f} M rows/s", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    x = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    perm = rng.permutation(K).astype(np.int32)
    idx2d = jnp.asarray(perm.reshape(K, 1))
    want = np.asarray(x)[perm]

    # (b) take_along_axis axis=0 with [K,C] broadcast indices
    idx_full = jnp.asarray(np.broadcast_to(perm.reshape(K, 1), (K, C)).copy())

    def k_b(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)

    f = probe("take_along_axis axis0 [K,C]", k_b, (x, idx_full),
              jax.ShapeDtypeStruct((K, C), jnp.float32))
    if f is not None:
        got = np.asarray(f(x, idx_full))
        print("  correct:", np.array_equal(got, want), flush=True)
        bench("take_along_axis axis0", f, (x, idx_full))

    # (c) lanes-gather: x [8, K], per-row indices
    xl = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    idxl = jnp.asarray(np.broadcast_to(perm.reshape(1, K), (8, K)).copy())

    def k_c(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)

    f = probe("take_along_axis lanes [8,K]", k_c, (xl, idxl),
              jax.ShapeDtypeStruct((8, K), jnp.float32))
    if f is not None:
        bench("take_along_axis lanes", f, (xl, idxl))


    # (a) take with indices loaded as [K,1] then squeezed inside
    def k_a(x_ref, i_ref, o_ref):
        ids = i_ref[:, :]  # [K,1]
        o_ref[:, :] = jnp.take(x_ref[:, :], ids[:, 0], axis=0, fill_value=0.0)

    f = probe("take axis0 idx[K]", k_a, (x, idx2d),
              jax.ShapeDtypeStruct((K, C), jnp.float32))
    if f is not None:
        got = np.asarray(f(x, idx2d))
        print("  correct:", np.array_equal(got, want), flush=True)
        bench("take axis0", f, (x, idx2d))

if __name__ == "__main__":
    main()
