"""Probe Mosaic TPU support for dynamic gather/permutation inside Pallas.

The radix-sort scatter needs a data-dependent permutation applied in VMEM.
This probes which primitives lower + their throughput:
  1. jnp.take(x, idx, axis=0) with dynamic idx
  2. x[idx] advanced indexing
  3. jax.lax.sort inside a kernel
"""

import time
import functools

jax_cache = "/root/.cache/jax"

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8192
C = 128


import jax as _j
_j.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
_j.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def probe(name, kernel, *args, out_shape):
    try:
        f = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        r = f(*args)
        np.asarray(r)
        print(f"{name}: OK", flush=True)
        return f
    except Exception as e:
        print(f"{name}: FAIL - {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def bench(name, f, *args, iters=20):
    if f is None:
        return
    def run(n):
        def body(i, acc):
            return acc + jnp.float32(1e-20) * jnp.sum(f(*args))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    g = jax.jit(run, static_argnums=0)
    float(g(1))
    t0 = time.perf_counter(); float(g(1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(iters + 1)); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e6:.1f} us -> {K/dt/1e6:.1f} M rows/s", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((K, C)).astype(np.float32))
    xr = jnp.asarray(rng.standard_normal((K, 1)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(K).astype(np.int32))
    idx2d = idx.reshape(K, 1)

    def k_take(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take(x_ref[:, :], i_ref[:, 0], axis=0)

    f1 = probe("take axis0 [8192,128]", k_take, x, idx2d,
               out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32))
    bench("take axis0 [8192,128]", f1, x, idx2d)

    def k_take_narrow(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take(x_ref[:, :], i_ref[:, 0], axis=0)

    f2 = probe("take axis0 [8192,1]", k_take_narrow, xr, idx2d,
               out_shape=jax.ShapeDtypeStruct((K, 1), jnp.float32))
    bench("take axis0 [8192,1]", f2, xr, idx2d)

    # gather along lanes (axis=-1): [8,K] take idx along axis 1
    xl = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    idxl = jnp.tile(idx.reshape(1, K), (8, 1))

    def k_take_lane(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)

    f3 = probe("take_along_axis lanes [8,8192]", k_take_lane, xl, idxl,
               out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32))
    bench("take_along_axis lanes [8,8192]", f3, xl, idxl)

    def k_sort(x_ref, o_ref):
        o_ref[:, :] = jnp.sort(x_ref[:, :], axis=1)

    f4 = probe("sort lanes [8,8192]", k_sort, xl,
               out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32))
    bench("sort lanes [8,8192]", f4, xl)

    # dynamic scatter via .at[].set inside kernel
    def k_scatter(x_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.zeros_like(o_ref).at[i_ref[:, 0]].set(x_ref[:, :])

    f5 = probe("scatter set [8192,128]", k_scatter, x, idx2d,
               out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32))
    bench("scatter set [8192,128]", f5, x, idx2d)


if __name__ == "__main__":
    main()
