"""Probe Mosaic tpu.dynamic_gather via jnp.take_along_axis (idx.shape == x.shape).

jax 0.9.0's Mosaic lowering registers lax.gather_p -> tpu.dynamic_gather for
2D take_along_axis along axis 0 or 1.  Earlier probes used non-matching index
shapes and never reached this path.  Questions answered here:

  1. does axis=1 (lanes) lower + run for [8,128] / [8,512] / [16,512]?
  2. are indices global across the axis, or per-128-lane-group local?
     (checked against numpy take_along_axis)
  3. do i32 values gather correctly (not just f32)?
  4. does axis=0 (sublanes) lower?
  5. throughput at expansion-kernel shapes.
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
        print(f"{name}: OK", flush=True)
        return f, r
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None, None


def k_tala1(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)


def k_tala0(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)


def case_lanes(f_rows, k, dtype, global_idx=True):
    x = rng.standard_normal((f_rows, k)).astype(np.float32)
    if dtype == np.int32:
        x = (x * 1e6).astype(np.int32)
    if global_idx:
        idx = rng.integers(0, k, size=(f_rows, k)).astype(np.int32)
    else:  # group-local: idx within each 128-lane group
        base = (np.arange(k) // 128) * 128
        idx = (base[None, :] + rng.integers(0, 128, size=(f_rows, k))).astype(
            np.int32
        )
    want = np.take_along_axis(x, idx, axis=1)
    name = f"tala axis=1 [{f_rows},{k}] {np.dtype(dtype).name} {'global' if global_idx else 'local128'}"
    f, got = probe(
        name,
        k_tala1,
        (jnp.asarray(x), jnp.asarray(idx)),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    if got is not None:
        print(f"  correct={np.array_equal(got, want)}", flush=True)
    return f


def case_sublanes(s, k, dtype=np.float32):
    x = rng.standard_normal((s, k)).astype(dtype)
    idx = rng.integers(0, s, size=(s, k)).astype(np.int32)
    want = np.take_along_axis(x, idx, axis=0)
    f, got = probe(
        f"tala axis=0 [{s},{k}]",
        k_tala0,
        (jnp.asarray(x), jnp.asarray(idx)),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    if got is not None:
        print(f"  correct={np.array_equal(got, want)}", flush=True)
    return f


def bench(name, f, args, iters=50):
    def run(n):
        def body(i, acc):
            return acc * jnp.float32(1e-30) + jnp.float32(1e-20) * jnp.sum(
                f(*args).astype(jnp.float32)
            )

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run)
    float(g(jnp.int32(1)))
    t0 = time.perf_counter(); float(g(jnp.int32(1))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(iters + 1))); tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"bench {name}: {dt*1e6:.1f} us/call", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    try:
        print("tpu_info:", pltpu.get_tpu_info(), flush=True)
    except Exception as e:
        print("tpu_info failed:", e, flush=True)

    f1 = case_lanes(8, 128, np.float32)
    case_lanes(8, 512, np.float32)          # global indices across 512 lanes
    case_lanes(8, 512, np.float32, global_idx=False)
    case_lanes(16, 512, np.int32)
    case_lanes(8, 2048, np.float32)
    case_sublanes(256, 128)

    # transpose [W,1] -> [1,W] (needed to turn a sublane count into lane idx)
    def k_tr(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    x = rng.standard_normal((512, 1)).astype(np.float32)
    f, got = probe(
        "transpose [512,1]->[1,512]",
        k_tr,
        (jnp.asarray(x),),
        jax.ShapeDtypeStruct((1, 512), np.float32),
    )
    if got is not None:
        print(f"  correct={np.array_equal(got, x.T)}", flush=True)

    if f1 is not None:
        xb = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
        ib = jnp.asarray(rng.integers(0, 512, size=(16, 512)).astype(np.int32))
        fb = jax.jit(
            lambda x, i: pl.pallas_call(
                k_tala1,
                out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)
        )
        try:
            np.asarray(fb(xb, ib))
            bench("tala [16,512] f32", fb, (xb, ib))
        except Exception as e:
            print("bench skipped:", str(e)[:150], flush=True)


if __name__ == "__main__":
    main()
