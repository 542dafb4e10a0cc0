"""Mosaic lowering gate: cross-lower every Pallas entry point for TPU.

Round 1 shipped a kernel that was green in the CPU test suite but failed
Mosaic lowering on TPU (VERDICT r1 weak #2): all Pallas tests ran with
``interpret=True``, which skips lowering entirely.  This gate closes that
hole without hardware: it forces compiled mode (``VK3D_PALLAS_COMPILED=1``)
and uses ``jax.export`` to run the full JAX->Mosaic lowering pipeline for
the *TPU* target from a CPU process.  Lowering is client-side and takes
seconds; any unsupported-op regression (strided-slice gathers, shape
mismatches, SMEM overflows, ...) is red here before it ever reaches the
device.

Coverage:
  * ``expand_rows``            — keygen monotone-expansion kernel
  * ``blend_tiles_pallas``     — tiled blend kernel
  * ``blend_tiles_pallas_flat``— flat-scheduled blend kernel
  * ``render_frame``           — the full frame program with
    ``expansion_method='pallas'`` and ``use_pallas_blend=True``, i.e. the
    exact composition bench.py runs on TPU.

Run directly (``python scripts/lowering_gate.py``) or via
``tests/test_lowering.py`` (subprocess, part of the default pytest run).

Limitation: this exercises JAX->Mosaic lowering, not the final Mosaic->LLO
device compile (server-side).  Round 1's failure class was the former.
"""

import os
import sys

# Must be set before the package (and hence pallas kernels) is imported:
# interpret_mode() is read at trace time and traces are cached per process.
os.environ["VK3D_PALLAS_COMPILED"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The distributed lowering needs a (virtual) 4-device mesh.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vk3dgaussiansplatting_tpu.core.config import (  # noqa: E402
    RenderConfig,
    SortAlgorithm,
)
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable  # noqa: E402
from vk3dgaussiansplatting_tpu.ops import keygen  # noqa: E402
from vk3dgaussiansplatting_tpu.ops.pallas import (  # noqa: E402
    blend_kernel,
    expand_kernel,
)
from vk3dgaussiansplatting_tpu import pipeline  # noqa: E402

CONFIG = RenderConfig(
    width=256,
    height=128,
    capacity_slack_per_tile=32,
    sort_algorithm=SortAlgorithm.XLA_SORT,
    expansion_method="pallas",
)


def _lower_tpu(fn, *args, name, forbid_scatter=False):
    """Trace + lower `fn(*args)` for the TPU target; raise on failure.

    With forbid_scatter, also assert the lowered module contains no
    stablehlo.scatter (CLAUDE.md: XLA scatter is pathological on this TPU
    stack — never in the frame path)."""
    exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    if forbid_scatter:
        n = exported.mlir_module().count("stablehlo.scatter")
        if n:
            raise AssertionError(f"{name}: {n} stablehlo.scatter ops in TPU HLO")
    n_bytes = len(exported.mlir_module_serialized)
    print(f"  ok  {name}  ({n_bytes} bytes stablehlo"
          + (", scatter-free" if forbid_scatter else "") + ")")


def _abstract(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def main():
    n = 1024
    capacity = CONFIG.sort_capacity(n)
    print(f"lowering gate: n={n} capacity={capacity} "
          f"{CONFIG.width}x{CONFIG.height} ({CONFIG.num_tiles} tiles)")

    # --- expand_rows -----------------------------------------------------
    packed = [jax.ShapeDtypeStruct((n,), jnp.int32) for _ in range(6)]
    counts = jax.ShapeDtypeStruct((n,), jnp.int32)
    _lower_tpu(
        lambda p, c: expand_kernel.expand_rows(p, c, capacity),
        packed,
        counts,
        name="expand_rows",
    )

    # --- blend kernels ---------------------------------------------------
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
    _lower_tpu(
        lambda e, r, f: blend_kernel.blend_tiles_pallas(e, r, f, CONFIG),
        elements,
        ranges,
        frame,
        name="blend_tiles_pallas",
    )
    _lower_tpu(
        lambda e, r, f: blend_kernel.blend_tiles_pallas_flat(e, r, f, CONFIG),
        elements,
        ranges,
        frame,
        name="blend_tiles_pallas_flat",
    )

    # --- full frame program (what bench.py jits on TPU) -------------------
    table = GaussianTable(
        position=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        scale=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        rot=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        sh=jax.ShapeDtypeStruct((n, 16, 3), jnp.float32),
        opacity=jax.ShapeDtypeStruct((n,), jnp.float32),
    )
    mat = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    cam = jax.ShapeDtypeStruct((3,), jnp.float32)
    _lower_tpu(
        lambda t, v, p, c: pipeline.render_frame(
            t, v, p, c, config=CONFIG, capacity=capacity, use_pallas_blend=True
        ),
        table,
        mat,
        mat,
        cam,
        name="render_frame[pallas expand+blend]",
        forbid_scatter=True,
    )

    # --- capped (saturation-truncated) blend with fallback -----------------
    import dataclasses as _dc

    from vk3dgaussiansplatting_tpu.ops import capped as capped_mod

    cap_cfg = _dc.replace(CONFIG, blend_depth_cap=256)
    elements_s = elements  # same abstract shapes post-sort
    cranges = jax.ShapeDtypeStruct((CONFIG.num_tiles, 2), jnp.uint32)
    _lower_tpu(
        lambda e, r, f: capped_mod.blend_tiles_capped(e, r, f, cap_cfg),
        elements_s,
        cranges,
        frame,
        name="blend_tiles_capped[cap=256]",
        forbid_scatter=True,
    )

    # --- distributed frame program (4-device mesh) -------------------------
    from vk3dgaussiansplatting_tpu.parallel import dist as dist_mod
    from vk3dgaussiansplatting_tpu.parallel.mesh import make_mesh

    ndev = 4
    mesh = make_mesh(ndev)
    dc = dist_mod.plan_distribution(CONFIG, n, ndev)
    dist_fn = dist_mod.make_distributed_render(
        mesh, CONFIG, dc, use_pallas_blend=True
    )
    _lower_tpu(
        dist_fn,
        table,
        mat,
        mat,
        cam,
        name=f"distributed_render[{ndev}dev]",
        forbid_scatter=True,
    )
    print("lowering gate: ALL OK")


if __name__ == "__main__":
    main()
