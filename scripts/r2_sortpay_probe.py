"""Corrected sort-payload + gather cost-structure probes.

r2_dma_probe's P4b consumed only one of its 8 payload columns, so XLA could
dead-code-eliminate the rest — its "payload is free" signal was unreliable.
These probes force EVERY output column into the digest.

Decisions driven:
  S1: lax.sort payload scaling at gaussian scale (u32 key + K u32 payloads,
      all consumed) — if payload is cheap, blend features can ride the
      element sort and the post-sort feature row-gather disappears;
  S2: the true element sort at garden capacity (u16 tile, u32 depth,
      u32 idx) and the same with 9 extra f32 feature payloads;
  G1: XLA row-gather vs table size (the 65k-row table gathered 20x faster
      than the 4M-row one in P6) and vs row width (4 -> 6.1 ns, 16 -> 22 ns:
      where is the cliff?).

Run: scripts/tpu_run.sh /tmp/q5_sortpay.txt 5400 900 2 -- \\
         python -u scripts/r2_sortpay_probe.py
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


def digest_all(outs):
    """Consume every output so nothing is DCE'd."""
    acc = jnp.float32(0.0)
    for o in outs:
        acc = acc + o[0].astype(jnp.float32) + o[-1].astype(jnp.float32)
    return acc


def probe_sort_payload(n, k_payloads):
    rng = np.random.default_rng(11)
    key = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    pays = [
        jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
        for _ in range(k_payloads)
    ]

    def fn(key, i):
        outs = lax.sort(
            (key + i.astype(jnp.uint32), *pays),
            dimension=0,
            num_keys=1,
            is_stable=True,
        )
        return digest_all(outs)

    bench(f"S1 sort u32+{k_payloads}pay (all used) @{n/1e6:.1f}M", fn, key)


def probe_element_sort(e, n_feat=0):
    rng = np.random.default_rng(12)
    tile = jnp.asarray(rng.integers(0, 8160, e).astype(np.uint16))
    depth = jnp.asarray(rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, 2**32, e, dtype=np.uint64).astype(np.uint32))
    feats = [
        jnp.asarray(rng.standard_normal(e).astype(np.float32))
        for _ in range(n_feat)
    ]

    def fn(tile, i):
        outs = lax.sort(
            (tile, depth + i.astype(jnp.uint32), idx, *feats),
            dimension=0,
            num_keys=2,
            is_stable=True,
        )
        return digest_all(outs)

    bench(f"S2 element sort u16+u32 keys +{1+n_feat}pay @{e/1e6:.1f}M", fn, tile)


def probe_gather(n, width, e=4_194_304):
    rng = np.random.default_rng(13)
    table = jnp.ones((n, width), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))

    def fn(table, idx, i):
        rows = jnp.take(table, idx + (i % 2), axis=0, mode="clip")
        return rows[0, 0] + rows[-1, -1] + rows[e // 2, width - 1]

    dt = bench(f"G1 gather [{n/1e6:.2f}M,{width}] x {e/1e6:.1f}M", fn, table, idx)
    if dt:
        print(f"    -> {dt/e*1e9:.2f} ns/row", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only-gather", action="store_true",
                    help="run just the G1 gather cost-structure probes")
    args = ap.parse_args()

    print(f"probes on {jax.devices()[0].platform}", flush=True)
    for n in (262_144, 1_048_576, 2_097_152):
        probe_gather(n, 10)
    for w in (8, 10, 12):
        probe_gather(4_000_000, w)
    probe_gather(4_000_000, 1)
    if not args.only_gather:
        for k in (1, 4, 9):
            probe_sort_payload(5_834_784, k)
        probe_element_sort(14_190_624, 0)
        # NOTE: the 9-feature element sort at 14.2M hung the remote compile
        # helper for >15 min on 2026-08-21; payload linearity is already
        # established by the 5.8M series, so it is intentionally omitted.
    print("probes done", flush=True)


if __name__ == "__main__":
    main()
