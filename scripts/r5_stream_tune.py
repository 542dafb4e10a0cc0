"""Tune STREAM_K (windows/step) x STREAM_C (buffer chunks) for the
streamed expansion in the THINNED (prefilter steady) regime — the only
regime that dispatches to it.  Parity re-checked per variant (block-shape
changes are the server-miscompile class).

Usage: scripts/tpu_run.sh /tmp/stune.txt 3600 600 2 -- python -u scripts/r5_stream_tune.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel as ek
import scripts.r5_expand_stream as probe


def set_kc(k, c):
    ek.STREAM_K = k
    ek.STREAM_C = c
    ek.expand_rows_streamed = functools.partial(
        jax.jit, static_argnames=("capacity",)
    )(ek.expand_rows_streamed.__wrapped__)
    probe.ek = ek


def main():
    print(f"devices: {jax.devices()}", flush=True)
    counts_t = probe.make_counts("thinned", 8)
    for k, c in [(8, 8), (8, 10), (8, 12), (8, 16), (16, 16), (16, 20), (4, 8)]:
        set_kc(k, c)
        if not probe.parity("thinned", probe.CAP_STEADY, wide=True, seed=8):
            print(f"K={k} C={c}: PARITY FAIL — skip timing", flush=True)
            continue
        probe.bench(
            f"stream K={k} C={c} thinned cap7.66M",
            ek.expand_rows_streamed,
            counts_t,
            probe.CAP_STEADY,
        )


if __name__ == "__main__":
    main()
