"""Remote Mosaic compile gate — the server-side complement to lowering_gate.

lowering_gate.py (pytest-wired) runs the client-side JAX->Mosaic lowering for
the TPU target; that catches unsupported-op regressions but NOT failures in
the Mosaic backend passes (infer-vector-layout, apply-vector-layout, LLO),
which run inside the axon terminal's tpu_compile_helper.  Observed 2026-08-20:
a `tpu.reshape (512xi32)->(64x8xi32)` passed client lowering but failed
server-side with `infer-vector-layout: unsupported shape cast`.

This gate AOT-compiles every Pallas entry point (small shapes, same as
lowering_gate) through the real axon compiler — seconds per kernel, no
execution, but it DOES need the tunnel, so it is a pre-bench / pre-round-end
step, not part of the default (CPU) pytest run:

    python scripts/tpu_compile_gate.py      # on the axon platform (default)

Run it before any long TPU bench: a kernel that passes here will not blow up
the bench's 20+ minute frame compile.
"""

import sys
import time

import jax

assert jax.default_backend() != "cpu", (
    "tpu_compile_gate must run on the axon/TPU platform (no --cpu, no "
    "JAX_PLATFORMS=cpu): its whole point is the server-side Mosaic compile."
)

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.core.config import (  # noqa: E402
    RenderConfig,
    SortAlgorithm,
)
from vk3dgaussiansplatting_tpu.ops import keygen  # noqa: E402
from vk3dgaussiansplatting_tpu.ops.pallas import (  # noqa: E402
    blend_kernel,
    expand_kernel,
)

CONFIG = RenderConfig(
    width=256,
    height=128,
    capacity_slack_per_tile=32,
    sort_algorithm=SortAlgorithm.XLA_SORT,
    expansion_method="pallas",
)


def _compile(fn, *args, name):
    t0 = time.time()
    jax.jit(fn).lower(*args).compile()
    print(f"  ok  {name}  ({time.time()-t0:.1f}s)", flush=True)


def main():
    n = 1024
    capacity = CONFIG.sort_capacity(n)
    print(f"tpu compile gate: n={n} capacity={capacity}", flush=True)

    packed = [jax.ShapeDtypeStruct((n,), jnp.int32) for _ in range(6)]
    counts = jax.ShapeDtypeStruct((n,), jnp.int32)
    _compile(
        lambda p, c: expand_kernel.expand_rows(p, c, capacity),
        packed,
        counts,
        name="expand_rows",
    )

    elements = keygen.SortElements(
        tile=jax.ShapeDtypeStruct((capacity,), jnp.uint32),
        depth=jax.ShapeDtypeStruct((capacity,), jnp.uint32),
        index=jax.ShapeDtypeStruct((capacity,), jnp.uint32),
        count=jax.ShapeDtypeStruct((), jnp.uint32),
    )
    ranges = jax.ShapeDtypeStruct((CONFIG.num_tiles, 2), jnp.uint32)
    frame = keygen.GaussianFrameData(
        color_alpha=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        cov2d=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        cov_inv=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        screen_pos=jax.ShapeDtypeStruct((n, 2), jnp.float32),
    )
    _compile(
        lambda e, r, f: blend_kernel.blend_tiles_pallas(e, r, f, CONFIG),
        elements,
        ranges,
        frame,
        name="blend_tiles_pallas",
    )
    _compile(
        lambda e, r, f: blend_kernel.blend_tiles_pallas_flat(e, r, f, CONFIG),
        elements,
        ranges,
        frame,
        name="blend_tiles_pallas_flat",
    )
    print("tpu compile gate: ALL OK", flush=True)


if __name__ == "__main__":
    main()
