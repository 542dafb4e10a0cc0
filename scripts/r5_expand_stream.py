"""Device parity + timing for the streamed-window expansion (round 5).

The streamed kernel (expand_kernel.expand_rows_streamed) amortizes the
per-window DMA + grid overhead of the production expansion across
STREAM_K-window grid steps backed by one contiguous chunk-buffer DMA.
Interpret-mode parity is covered by tests/test_expand.py; this script
(a) re-proves bit-parity ON DEVICE at garden-like scales (the W=1024
miscompile class was server-side only), and (b) times streamed vs the
production wide/narrow kernels under the RELIABLE in-jit fori protocol.

Usage: scripts/tpu_run.sh /tmp/stream.txt 3600 600 2 -- python -u scripts/r5_expand_stream.py
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

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel as ek

N = 5_834_784
CAP_FULL = 14_190_592
CAP_STEADY = 7_662_592
NCOLS = 6


def make_counts(regime, seed=7):
    rng = np.random.default_rng(seed)
    if regime == "dense":
        counts = rng.poisson(2.4, size=N).astype(np.int32)
        counts[rng.random(N) < 0.3] = 0
    elif regime == "thinned":
        counts = rng.integers(1, 4, size=N).astype(np.int32)
        counts[rng.random(N) < 0.55] = 0
    else:  # adversarial: long culled gaps + huge gaussians
        counts = rng.poisson(1.2, size=N).astype(np.int32)
        counts[rng.random(N) < 0.4] = 0
        gap = max(N // 100, 8)
        for _ in range(40):
            a = rng.integers(0, N - gap)
            counts[a : a + rng.integers(gap // 6, gap)] = 0
        counts[rng.integers(0, N, 60)] = rng.integers(3_000, 20_000, 60)
    return counts


def make_cols(seed=3):
    rng = np.random.default_rng(seed)
    cols = [np.arange(N, dtype=np.int32)]
    for _ in range(NCOLS - 1):
        cols.append(rng.integers(-(2**31), 2**31, size=N).astype(np.int32))
    return [jnp.asarray(c) for c in cols]


@jax.jit
def device_equal(a_cols, b_cols):
    ok = jnp.bool_(True)
    for a, b in zip(a_cols, b_cols):
        ok = ok & jnp.all(a == b)
    return ok


def parity(regime, cap, wide, seed):
    counts = jnp.asarray(make_counts(regime, seed))
    cols = make_cols(seed)
    t0 = time.perf_counter()
    got, tot_a = ek.expand_rows_streamed(cols, counts, cap)
    ref, tot_b = ek.expand_rows(cols, counts, cap, wide_span=wide)
    # mask dead slots identically (streamed zeroes whole dead STEPS, the
    # per-window kernel zeroes dead WINDOWS; live slots are the contract)
    live = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(tot_a, cap)
    got = [jnp.where(live, c, 0) for c in got]
    ref = [jnp.where(live, c, 0) for c in ref]
    ok = bool(device_equal(got, ref))
    same_tot = int(tot_a) == int(tot_b)
    print(
        f"parity {regime} cap={cap/1e6:.2f}M wide={wide}: "
        f"{'OK' if ok and same_tot else 'MISMATCH'} ({time.perf_counter()-t0:.1f}s)",
        flush=True,
    )
    return ok and same_tot


def bench(name, expand_fn, counts, cap, iters=12):
    cols = make_cols(1)
    one_hot = (jnp.arange(N, dtype=jnp.int32) == 0).astype(jnp.int32)

    def step(i, counts, *cols):
        c = counts + one_hot * (i & 1)  # per-iter perturbation
        out_cols, total = expand_fn(list(cols), c, cap)
        s = total.astype(jnp.float32)
        for oc in out_cols:
            s = s + jnp.sum(oc, dtype=jnp.int32).astype(jnp.float32)
        return s

    def run(k, counts, *cols):
        def body(i, acc):
            return acc * jnp.float32(1e-30) + step(i, counts, *cols)

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    g = jax.jit(run, static_argnums=())
    cj = jnp.asarray(counts)
    t0 = time.perf_counter(); float(g(jnp.int32(1), cj, *cols))
    c0 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(1), cj, *cols))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g(jnp.int32(iters + 1), cj, *cols))
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn - t1) / iters * 1e3:.2f} ms (first {c0:.1f}s)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ok = True
    ok &= parity("dense", CAP_FULL, wide=False, seed=7)
    ok &= parity("thinned", CAP_STEADY, wide=True, seed=8)
    ok &= parity("adversarial", CAP_STEADY, wide=True, seed=9)
    if not ok:
        print("PARITY FAILED — do not ship", flush=True)
        return

    counts_d = make_counts("dense", 7)
    counts_t = make_counts("thinned", 8)
    wide_fn = lambda cols, c, cap: ek.expand_rows(cols, c, cap, wide_span=True)
    narrow_fn = lambda cols, c, cap: ek.expand_rows(cols, c, cap, wide_span=False)
    bench("narrow  dense  cap14.19M", narrow_fn, counts_d, CAP_FULL)
    bench("stream  dense  cap14.19M", ek.expand_rows_streamed, counts_d, CAP_FULL)
    bench("wide    thinned cap7.66M", wide_fn, counts_t, CAP_STEADY)
    bench("stream  thinned cap7.66M", ek.expand_rows_streamed, counts_t, CAP_STEADY)


if __name__ == "__main__":
    main()
