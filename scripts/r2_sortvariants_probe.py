"""Sort-variant probes: can the 55 ms garden element sort be cheaper?

S2 (r2_sortpay_probe) measured (u16 tile, u32 depth) keys + u32 idx payload
at 14.19M = 55.5 ms.  Variants tried here, all order-equivalent:

  V1: same but all-u32 keys (u16 comparators may scalarize);
  V2: num_keys=3 with idx as the last key, is_stable=False — the idx column
      is unique, so the unstable 3-key sort is deterministically EQUAL to
      the stable 2-key sort (exactness preserved) and may hit a faster path;
  V3: stability cost control: 2-key is_stable=False (NOT order-exact — cost
      reference only);
  V4: single fused u32 key (tile13 << 19 | depth_hi19) + u16 depth_lo
      cost model (order needs a fixup pass — cost reference only);
  V5: V2 at train capacity (4.25M) for the scaling curve.
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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    print(f"  [{name}] compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    float(f(jnp.int32(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.int32(iters + 1)))
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return dt


def digest(outs):
    acc = jnp.float32(0.0)
    for o in outs:
        acc = acc + o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
    return acc


def make_arrays(e):
    rng = np.random.default_rng(21)
    tile16 = jnp.asarray(rng.integers(0, 8160, e).astype(np.uint16))
    tile32 = tile16.astype(jnp.uint32)
    depth = jnp.asarray(
        rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32)
    )
    idx = jnp.asarray(np.arange(e, dtype=np.uint32))
    return tile16, tile32, depth, idx


def main():
    print(f"probes on {jax.devices()[0].platform}", flush=True)
    e = 14_190_624
    tile16, tile32, depth, idx = make_arrays(e)

    def v1(t, i):
        outs = lax.sort(
            (tile32, depth + i.astype(jnp.uint32), idx),
            dimension=0, num_keys=2, is_stable=True,
        )
        return digest(outs)

    bench(f"V1 u32keys stable 2key @{e/1e6:.1f}M", v1, tile32)

    def v2(t, i):
        outs = lax.sort(
            (tile16, depth + i.astype(jnp.uint32), idx),
            dimension=0, num_keys=3, is_stable=False,
        )
        return digest(outs)

    bench(f"V2 3key unstable (order-exact) @{e/1e6:.1f}M", v2, tile16)

    def v3(t, i):
        outs = lax.sort(
            (tile16, depth + i.astype(jnp.uint32), idx),
            dimension=0, num_keys=2, is_stable=False,
        )
        return digest(outs)

    bench(f"V3 2key unstable (cost ref) @{e/1e6:.1f}M", v3, tile16)

    fused = (tile32 << jnp.uint32(19)) | (depth >> jnp.uint32(13))
    lo = (depth & jnp.uint32(0x1FFF)).astype(jnp.uint16)

    def v4(t, i):
        outs = lax.sort(
            (fused + i.astype(jnp.uint32), lo, idx),
            dimension=0, num_keys=1, is_stable=True,
        )
        return digest(outs)

    bench(f"V4 fused u32 key + u16 + idx (cost ref) @{e/1e6:.1f}M", v4, fused)

    e2 = 4_245_463
    t16b, _, depthb, idxb = make_arrays(e2)

    def v5(t, i):
        outs = lax.sort(
            (t16b, depthb + i.astype(jnp.uint32), idxb),
            dimension=0, num_keys=3, is_stable=False,
        )
        return digest(outs)

    bench(f"V5 3key unstable @{e2/1e6:.1f}M", v5, t16b)
    print("probes done", flush=True)


if __name__ == "__main__":
    main()
