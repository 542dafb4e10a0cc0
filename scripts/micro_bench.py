"""TPU microbenchmarks: characterize the chip before designing kernels.

The axon tunnel to the TPU has ~28 ms round-trip latency and completion is
only observable by fetching results, so every measurement runs the op N times
*inside one jit* (chained through a scalar digest to prevent hoisting) and
fetches a scalar once.  Reported time = (t_loop(N) - t_loop(1)) / (N - 1).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench_loop(make_op, iters):
    """make_op(perturb_scalar) -> digest scalar; chained through the loop.

    Trip count is a *device* value so run(1) and run(N) share one compiled
    executable — compilation over the tunnel costs ~a minute per program.
    """

    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-20) + make_op(acc * jnp.float32(1e-20))

        return lax.fori_loop(0, n, body, jnp.float32(0.0), unroll=False)

    f = jax.jit(run)
    one = jnp.int32(1)
    many = jnp.int32(iters + 1)
    float(f(one))  # compile + warm
    t0 = time.perf_counter()
    float(f(one))
    t1 = (time.perf_counter() - t0)
    t0 = time.perf_counter()
    float(f(many))
    tn = (time.perf_counter() - t0)
    return (tn - t1) / iters


def report(name, seconds, detail=""):
    print(f"{name}: {seconds*1e3:.3f} ms {detail}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    n = 1 << 24  # 16.7M

    x = jnp.asarray(rng.random(n, dtype=np.float32) + 0.5)
    print("uploaded 16M", flush=True)

    t = bench_loop(lambda s: jnp.sum((x + s) * 2.0), 20)
    report("add+mul 16M f32", t, f"-> {3*4*n/t/1e9:.0f} GB/s stream")

    t = bench_loop(lambda s: jnp.sum(jnp.exp(x * jnp.float32(1e-3) + s)), 20)
    report("exp 16M", t, f"-> {n/t/1e9:.2f} G exp/s")

    t = bench_loop(lambda s: jnp.sum(jnp.log1p(x + s)), 20)
    report("log1p 16M", t)

    t = bench_loop(lambda s: jnp.sum(jnp.cumsum(x + s)), 10)
    report("cumsum 16M", t)

    xb = (x[: (1 << 22)]).reshape(-1, 256)  # [16k,256]
    t = bench_loop(lambda s: jnp.sum(jnp.cumsum(xb + s, axis=0)), 10)
    report("cumsum [16k,256] ax0", t)

    for m, dt_ in ((4096, jnp.float32), (4096, jnp.bfloat16)):
        a = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32)).astype(dt_)
        t = bench_loop(
            lambda s, a=a, dt_=dt_: jnp.sum(
                jnp.dot(a + s.astype(dt_), a, preferred_element_type=jnp.float32)
            ),
            10,
        )
        report(f"matmul {dt_.__name__} {m}", t, f"-> {2*m**3/t/1e12:.1f} TFLOP/s")

    # small matmul shape used by blend: [512,8]@[8,256] done 1024x per iter
    a = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))

    def blend_mm(s):
        def body(i, acc):
            return acc + jnp.sum(jnp.dot(a + acc * 1e-20, b))

        return lax.fori_loop(0, 64, body, s * 0.0)

    t = bench_loop(blend_mm, 5)
    report("64x matmul [512,8]@[8,256]", t, f"({t/64*1e6:.1f} us each)")

    # XLA sort at pipeline scale: 13M 2-key u32
    e = 13_000_000
    tile = jnp.asarray(rng.integers(0, 8160, e).astype(np.uint32))
    depth = jnp.asarray(rng.integers(0, 2**32 - 1, e).astype(np.uint32))
    idx = jnp.arange(e, dtype=jnp.uint32)
    jax.block_until_ready((tile, depth, idx))

    def do_sort(s):
        t2 = tile + s.astype(jnp.uint32)
        st, sd, si = lax.sort((t2, depth, idx), dimension=0, num_keys=2, is_stable=True)
        return jnp.sum(sd[:8].astype(jnp.float32)) + jnp.sum(si[:8].astype(jnp.float32))

    t = bench_loop(do_sort, 3)
    report("lax.sort 13M 2-key stable", t, f"-> {e/t/1e6:.0f} M elem/s")

    # gather 13M x 32B rows
    tbl = jnp.asarray(rng.standard_normal((5_800_000, 8)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, 5_800_000, e).astype(np.int32))
    jax.block_until_ready((tbl, gidx))
    t = bench_loop(lambda s: jnp.sum(tbl[gidx] + s), 5)
    report("gather 13M x 32B", t, f"-> {e*32/t/1e9:.0f} GB/s eff")

    # scatter-add 5.8M -> 13M
    offs = jnp.asarray(np.sort(rng.integers(0, e, 5_800_000).astype(np.int32)))
    jax.block_until_ready(offs)
    t = bench_loop(
        lambda s: jnp.sum(
            jnp.zeros((e,), jnp.float32).at[offs].add(1.0 + s).astype(jnp.float32)[:64]
        ),
        5,
    )
    report("scatter-add 5.8M->13M", t)

    # repeat-expansion
    counts = jnp.full((5_800_000,), 2, dtype=jnp.int32)
    t = bench_loop(
        lambda s: jnp.sum(
            jnp.repeat(
                jnp.arange(5_800_000, dtype=jnp.int32) + s.astype(jnp.int32),
                counts,
                total_repeat_length=e,
            )[:64].astype(jnp.float32)
        ),
        5,
    )
    report("repeat 5.8M->13M", t)

    # int div/mod 13M by small dynamic divisor
    d1 = jnp.asarray(rng.integers(1, 30, e).astype(np.int32))
    d2 = jnp.asarray(rng.integers(0, 1000, e).astype(np.int32))
    jax.block_until_ready((d1, d2))
    t = bench_loop(
        lambda s: jnp.sum(((d2 + s.astype(jnp.int32)) // d1)[:64].astype(jnp.float32)),
        5,
    )
    report("int div 13M", t)


if __name__ == "__main__":
    main()
