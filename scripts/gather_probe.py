"""Isolate XLA gather vs transpose costs for the feature-build redesign."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)


def bench(name, fn, iters=6):
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + fn(acc * jnp.float32(1e-20))

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    print(f"  [{name}] compiling...", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    n, e = 559_263, 4_245_663
    table = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    jax.block_until_ready((table, idx))

    bench("gather [4.2M,16] random", lambda s: jnp.sum((table + s)[idx][::1001, :]))
    bench("gather [4.2M,16] sorted idx", lambda s: jnp.sum((table + s)[idx_sorted][::1001, :]))
    bench(
        "gather+transpose to [16,4.2M]",
        lambda s: jnp.sum(((table + s)[idx]).T[:, ::1001]),
    )
    col = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    bench("gather [4.2M] narrow (1 col)", lambda s: jnp.sum((col + s)[idx][::1001]))
    big = jnp.asarray(rng.standard_normal((e, 16)).astype(np.float32))
    bench("pure transpose [4.2M,16]->[16,..]", lambda s: jnp.sum((big + s).T[:, ::1001]))


if __name__ == "__main__":
    main()
