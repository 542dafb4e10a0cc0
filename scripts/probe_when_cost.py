"""Micro-probe: cost of pl.when-guarded crossbars vs unconditional.

The expansion's crossbar band-skip regressed keygen 35 -> 101 ms at garden.
Candidate culprits: (a) in-kernel vector->scalar min/max reductions,
(b) the 16 dynamic pl.when branches per window, (c) out_ref accumulation.
This probe isolates (b): M iterations of 16 [8,128] crossbars,
  K1: unconditional (baseline; expect ~16 * 85 ns per iter);
  K2: each wrapped in pl.when(True-valued prefetched scalar);
  K3: half the scalars false (skip should WIN if branches are cheap).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

M = 20_000
NG = 16


def k_uncond(x_ref, i_ref, o_ref):
    def body(i, acc):
        g = acc
        for _ in range(NG):
            g = jnp.take_along_axis(x_ref[:, :] + g[0:1, 0:1], i_ref[:, :], axis=1)
        return g

    o_ref[:, :] = lax.fori_loop(0, M, body, jnp.zeros((8, 128), jnp.int32))


def k_when(c_ref, x_ref, i_ref, o_ref, acc_ref):
    acc_ref[:, :] = jnp.zeros((8, 128), jnp.int32)

    def body(i, carry):
        for g in range(NG):

            @pl.when(c_ref[g] > 0)
            def _():
                acc_ref[:, :] = jnp.take_along_axis(
                    x_ref[:, :] + acc_ref[0:1, 0:1], i_ref[:, :], axis=1
                )

        return carry

    lax.fori_loop(0, M, body, 0)
    o_ref[:, :] = acc_ref[:, :]


def bench(name, fn, *args, iters=4):
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + fn(*args, i)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.time()
    try:
        float(f(jnp.int32(1)))
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:180]}", flush=True)
        return
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.3f} ms total, {dt/M*1e9:.0f} ns/iter "
          f"({dt/M/NG*1e9:.1f} ns per guarded crossbar)", flush=True)


def main():
    print(f"device {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1000, (8, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))

    call_u = pl.pallas_call(
        k_uncond,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    bench("K1 uncond", lambda x, i, s: call_u(x + s.astype(jnp.int32), idx)[0, 0]
          .astype(jnp.float32), x, idx)

    def make_when(conds):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        call = pl.pallas_call(
            k_when,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            grid_spec=grid_spec,
        )
        c = jnp.asarray(conds, jnp.int32)
        return lambda x, i, s: call(c, x + s.astype(jnp.int32), idx)[0, 0].astype(
            jnp.float32
        )

    bench("K2 when-all-true", make_when([1] * NG), x, idx)
    bench("K3 when-half-false", make_when([1, 0] * (NG // 2)), x, idx)


if __name__ == "__main__":
    main()
