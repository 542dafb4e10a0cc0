"""Frame pipeline — the reference `Renderer` re-imagined as a jitted query plan.

The reference Renderer (Engine/Graphics/Renderer.{h,cpp}) owns Vulkan objects,
sizes GPU buffers per scene (initForScene, Renderer.cpp:712-756) and records a
9-pass command buffer each frame (recordCommandBuffer, Renderer.cpp:540-629).
On TPU the frame is a single traced function: barriers are implicit in SSA
dataflow, buffer lifetimes are XLA's problem, indirect dispatch becomes static
capacity + masks, and the three frames-in-flight (GfxSettings.h:15) fall out
of JAX's async dispatch for free.

    keygen (cull + keys + SH)  ->  sort  ->  find_ranges  ->  blend

`Renderer.init_for_scene` plays the role of the reference's initForScene:
fixes the static capacity (the same `ceilPow2(N + 64*16*tiles)` formula,
Renderer.cpp:725), uploads the gaussian table once (`device_put` — the
staging-buffer copy, Buffer.cpp:74-108), and traces/compiles the frame
executable (pipeline-creation equivalent).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import RenderConfig
from .models.gaussians import GaussianTable
from .ops import blend as blend_ops
from .ops import keygen as keygen_ops
from .ops import ranges as ranges_ops
from .ops import sort as sort_ops


class FrameOutputs(NamedTuple):
    """One rendered frame plus inspection intermediates."""

    image_u8: jax.Array  # [H, W, 4] uint8 (rgba, the swapchain image)
    image: jax.Array  # [H, W, 3] float32 pre-quantization
    num_elements: jax.Array  # [] uint32 live sort elements


@functools.partial(
    jax.jit, static_argnames=("config", "capacity", "use_pallas_blend")
)
def render_frame(
    table: GaussianTable,
    view,
    proj,
    cam_pos,
    *,
    config: RenderConfig,
    capacity: int,
    use_pallas_blend: bool = False,
) -> FrameOutputs:
    """The full 9-pass frame as one XLA program."""
    elements, frame = keygen_ops.generate_sort_elements(
        table, view, proj, cam_pos, config, capacity
    )
    elements = sort_ops.sort_elements(elements, config)
    ranges = ranges_ops.find_ranges(elements, config.num_tiles)
    if use_pallas_blend and config.blend_depth_cap > 0:
        from .ops import capped as capped_ops

        image = capped_ops.blend_tiles_capped(elements, ranges, frame, config)
    elif use_pallas_blend:
        from .ops.pallas import blend_kernel

        image = blend_kernel.blend_tiles_pallas(elements, ranges, frame, config)
    else:
        image = blend_ops.blend_tiles_xla(elements, ranges, frame, config)
    return FrameOutputs(
        image_u8=blend_ops.quantize_image(image),
        image=image,
        num_elements=elements.count,
    )


@functools.partial(jax.jit, static_argnames=("config", "capacity"))
def render_frame_temporal(
    table: GaussianTable,
    view,
    proj,
    cam_pos,
    caps,
    *,
    config: RenderConfig,
    capacity: int,
):
    """Frame with the temporal per-tile-caps blend (ops/capped.py).

    `caps` is the per-tile cap state from the previous frame
    (capped_ops.init_caps to start); returns (FrameOutputs, caps_next).
    The frame is exact within the quantized-image contract
    (docs/TOLERANCES.md) regardless of whether the caps validated —
    validated tiles drop per-pixel tails bounded by transmittance_stop *
    cap_validation_factor, and invalid frames take the in-graph full-blend
    fallback and escalate their caps.
    """
    from .ops import capped as capped_ops

    elements, frame = keygen_ops.generate_sort_elements(
        table, view, proj, cam_pos, config, capacity
    )
    elements = sort_ops.sort_elements(elements, config)
    ranges = ranges_ops.find_ranges(elements, config.num_tiles)
    image, caps_next, _ok = capped_ops.blend_tiles_capped_temporal(
        elements, ranges, frame, config, caps
    )
    return (
        FrameOutputs(
            image_u8=blend_ops.quantize_image(image),
            image=image,
            num_elements=elements.count,
        ),
        caps_next,
    )


class Renderer:
    """Scene-bound renderer (reference: Renderer + initForScene)."""

    def __init__(self, config: RenderConfig, *, use_pallas_blend: bool | None = None):
        self.config = config
        if use_pallas_blend is None:
            use_pallas_blend = jax.default_backend() == "tpu"
        self.use_pallas_blend = use_pallas_blend
        # Temporal per-tile caps (production blend policy): used whenever the
        # Pallas blend is on and blend_depth_cap > 0.  The caps array is the
        # renderer's only cross-frame state (reset per scene).
        self.temporal_caps = use_pallas_blend and config.blend_depth_cap > 0
        self._caps = None
        self.table: GaussianTable | None = None
        self.capacity: int | None = None

    def init_for_scene(self, table: GaussianTable) -> None:
        """Upload the gaussian table and fix static sizes (Renderer.cpp:712)."""
        self.capacity = self.config.sort_capacity(table.num_gaussians)
        self._caps = None  # temporal caps reset on scene swap
        self.table = jax.device_put(
            GaussianTable(
                position=jnp.asarray(table.position, dtype=jnp.float32),
                scale=jnp.asarray(table.scale, dtype=jnp.float32),
                rot=jnp.asarray(table.rot, dtype=jnp.float32),
                sh=jnp.asarray(table.sh, dtype=jnp.float32),
                opacity=jnp.asarray(table.opacity, dtype=jnp.float32),
            )
        )

    def draw(self, camera) -> FrameOutputs:
        """Render one frame from a `render.camera.Camera`."""
        if self.table is None:
            raise RuntimeError("call init_for_scene() first")
        view, proj = camera.matrices()
        if self.temporal_caps:
            from .ops import capped as capped_ops

            if self._caps is None:
                self._caps = capped_ops.init_caps(self.config)
            out, self._caps = render_frame_temporal(
                self.table,
                jnp.asarray(view),
                jnp.asarray(proj),
                jnp.asarray(camera.position, dtype=jnp.float32),
                self._caps,
                config=self.config,
                capacity=self.capacity,
            )
            return out
        return render_frame(
            self.table,
            jnp.asarray(view),
            jnp.asarray(proj),
            jnp.asarray(camera.position, dtype=jnp.float32),
            config=self.config,
            capacity=self.capacity,
            use_pallas_blend=self.use_pallas_blend,
        )

    def draw_numpy(self, camera):
        """Render and fetch to host (uint8 rgba)."""
        out = self.draw(camera)
        return np.asarray(out.image_u8)
