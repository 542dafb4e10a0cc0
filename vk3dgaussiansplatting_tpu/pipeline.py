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


_quantize_jit = jax.jit(lambda img: blend_ops.quantize_image(img))
_or_jit = jax.jit(jnp.logical_or)


class FrameOutputs(NamedTuple):
    """One rendered frame plus inspection intermediates.

    `ok` is a [] bool DEVICE scalar (None on paths without the capped
    policy): True when every tile validated (or was patched) this frame —
    i.e. the frame is exact within the quantized-image contract.  A False
    frame was degraded (steady-capacity overflow truncation or an
    unpatchable prefiltered tile); recovery takes ~1 frame with the snap
    threshold reset, or up to ~6 flagged frames under the default damped
    reset ramp (config.thr_reset_damp — the trade that keeps tight steady
    capacities stable).  Callers that care should fetch it
    asynchronously (fetching per frame serializes the dispatch queue —
    CLAUDE.md).
    """

    image_u8: jax.Array  # [H, W, 4] uint8 (rgba, the swapchain image)
    image: jax.Array  # [H, W, 3] float32 pre-quantization
    num_elements: jax.Array  # [] uint32 live sort elements
    ok: jax.Array | None = None  # [] bool: frame validated (device scalar)


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
    image, caps_next, ok = capped_ops.blend_tiles_capped_temporal(
        elements, ranges, frame, config, caps
    )
    return (
        FrameOutputs(
            image_u8=blend_ops.quantize_image(image),
            image=image,
            num_elements=elements.count,
            ok=ok,
        ),
        caps_next,
    )


class ChainedTemporalPlan:
    """Per-pass chained dispatch with the temporal capped blend and the
    depth-prefilter steady set — the production big-scene frame plan.

    A monolithic garden-scale frame program breaks the remote TPU compiler
    (transport broken pipe after ~25 min; CLAUDE.md), so big scenes
    dispatch each pass as its own cacheable program:

        keygen -> sort -> find_ranges -> capped_layout -> capped_gather
        -> capped_finish

    with the temporal CapsState (caps + prefilter thresholds + decay
    floors, ops/capped.py) carried across frames as device arrays.  After
    `warmup_frames` frames the caller may call `try_steady_switch()`:
    keygen then drops past-saturation gaussians against the published
    thresholds and keygen/sort/ranges re-compile at `steady_frac` of the
    full capacity — the single biggest frame-cost lever (every per-element
    pass scales with the static capacity).

    Reference analogue: `Renderer::draw` + `recordCommandBuffer`
    (Renderer.cpp:297, 540-629); the per-pass programs play the command
    buffer's role, with barriers implicit in the program chain.
    """

    def __init__(
        self,
        config: RenderConfig,
        capacity: int,
        *,
        steady_frac: float = 0.51,
        log=None,
    ):
        from .ops import capped as capped_ops

        assert config.blend_depth_cap > 0, "temporal plan needs a cap"
        self.config = config
        self.capacity = capacity
        self.prefilter_on = steady_frac > 0
        self.steady_capacity = (
            -(-int(capacity * steady_frac) // 512) * 512
            if self.prefilter_on
            else None
        )
        self.state = (
            capped_ops.init_caps_state(config)
            if self.prefilter_on
            else capped_ops.init_caps(config)
        )
        self.mode = "full"  # "full" | "steady"
        self.steady_declined = False  # a failed switch is not retried
        self._count_fn = None
        self.frames = 0
        self._log = log or (lambda *a: None)
        self._sets = {}
        self._first = set()
        # Device-array telemetry of the last frame (fetch = host sync).
        self.last_ok = None
        self.last_stats = None
        self.last_count = None
        self.last_elements = None
        self.last_ranges = None
        self.last_frame = None
        # Opt-in (bench image check): retain per-frame element/frame-data
        # device references.  Off by default — pinning them costs ~350 MB
        # HBM at garden shapes that product callers never use (r5 review).
        self.keep_intermediates = False
        # Steady-overflow accumulator: OR of every steady frame's overflow
        # flag since the last `take_overflow_acc()` — a device scalar, so
        # an intermittent overflow can never fall between periodic samples
        # (r4 advisor).  `Renderer.draw` reads it with a one-window-stale
        # async fetch (zero blocking syncs in the frame loop).
        self._ovf_acc = None
        # Fuse everything after keygen (sort + ranges + the 3 capped split
        # phases) into ONE program on the steady path: measured 187.4 vs
        # 191.6 ms/frame at garden frac-0.51 shapes (scripts/r5_chain_fuse.py
        # grouping C; grouping D — keygen fused in too — is slower at 189.0,
        # and the r4 "in-graph gather 2x penalty" that forced the per-pass
        # split no longer reproduces on the r5 server stack).  The FULL-
        # capacity warmup path stays per-pass: it is untimed, and the
        # 14.19M-element fused program is the compile-risk class CLAUDE.md
        # documents.
        self.fuse_steady = True
        self._fused = {}
        self._last_kg = None

    def _passes(self, cap_e: int, filtered: bool):
        key = (cap_e, filtered)
        if key not in self._sets:
            config = self.config
            if filtered:
                kg = jax.jit(
                    lambda t, v, p, c, thr: keygen_ops.generate_sort_elements(
                        t, v, p, c, config, cap_e, depth_thr=thr
                    )
                )
            else:
                kg = jax.jit(
                    lambda t, v, p, c: keygen_ops.generate_sort_elements(
                        t, v, p, c, config, cap_e
                    )
                )
            so = jax.jit(lambda el: sort_ops.sort_elements(el, config))
            rg = jax.jit(
                lambda el: ranges_ops.find_ranges(el, config.num_tiles)
            )
            self._sets[key] = (kg, so, rg)
        return self._sets[key]

    def _fused_rest(self):
        """One jitted program for everything after keygen (steady path):
        sort -> find_ranges -> capped layout/gather/finish."""
        if "rest" not in self._fused:
            from .ops import capped as capped_ops

            config = self.config

            def rest(el, fr, st):
                se = sort_ops.sort_elements(el, config)
                rg = ranges_ops.find_ranges(se, config.num_tiles)
                img, st2, ok, stats = capped_ops.blend_tiles_capped_split(
                    se, rg, fr, config, st
                )
                return img, st2, ok, stats

            self._fused["rest"] = jax.jit(rest)
        return self._fused["rest"]

    def materialize_intermediates(self):
        """Recompute the last kept frame's sorted elements + ranges into
        `last_elements`/`last_ranges` (bench image check, fused steady
        path).  Sort and find_ranges are deterministic integer passes, so
        the recompute is bit-identical to what the fused program consumed
        in-graph.  One extra sort dispatch, OUTSIDE the timed loop."""
        if self._last_kg is None or self.last_elements is not None:
            return
        el, fr = self._last_kg
        filtered = self.mode == "steady"
        cap_e = self.steady_capacity if filtered else self.capacity
        _kg, so, rg = self._passes(cap_e, filtered)
        se = so(el)
        self.last_elements = se
        self.last_ranges = rg(se)
        self.last_frame = fr

    def frame(self, table, view, proj, cam_pos):
        """Dispatch one frame; returns the [H, W, 3] float32 device image.

        Nothing is fetched: the image, ok flag, stats vector, and element
        count stay on device (async dispatch) — read `.last_*` to sync.
        """
        import time as _time

        from .ops import capped as capped_ops

        filtered = self.mode == "steady"
        cap_e = self.steady_capacity if filtered else self.capacity
        kg, so, rg = self._passes(cap_e, filtered)
        first = (cap_e, filtered) not in self._first
        t0 = _time.time()
        marks = [t0]
        if filtered:
            el, fr = kg(table, view, proj, cam_pos, self.state.thr)
        else:
            el, fr = kg(table, view, proj, cam_pos)
        marks.append(_time.time())
        if first:
            self._log(f"  [compile] keygen done t+{_time.time()-t0:.0f}s")
        if filtered and self.fuse_steady:
            # Steady path: one fused program for everything after keygen
            # (see __init__ fuse_steady note; -4 ms/frame measured).
            img, self.state, ok, st = self._fused_rest()(el, fr, self.state)
            if self.keep_intermediates:
                # Keep the kg outputs (device refs, no fetch, no extra
                # program outputs in the timed frames); the bench image
                # check calls materialize_intermediates() to rebuild the
                # sorted elements + ranges bit-identically outside timing.
                self._last_kg = (el, fr)
                self.last_elements = None
        else:
            el = so(el)
            marks.append(_time.time())
            if first:
                self._log(f"  [compile] sort done t+{_time.time()-t0:.0f}s")
            r = rg(el)
            marks.append(_time.time())
            if first:
                self._log(
                    f"  [compile] ranges done t+{_time.time()-t0:.0f}s"
                )
            img, self.state, ok, st = capped_ops.blend_tiles_capped_split(
                el, r, fr, self.config, self.state
            )
            if self.keep_intermediates:
                # (same image-check intermediates as the fused branch)
                self.last_elements, self.last_ranges, self.last_frame = (
                    el, r, fr,
                )
        marks.append(_time.time())
        if first:
            self._log(f"  [compile] blend done t+{_time.time()-t0:.0f}s")
            self._first.add((cap_e, filtered))
        if filtered:
            # Steady-capacity overflow would TRUNCATE the element list for
            # arbitrary tiles with range-fit validation still passing
            # (r4 code review): flag the frame, and let draw()'s periodic
            # check revert to the full set.
            overflow = el.count >= jnp.uint32(cap_e)
            ok = ok & jnp.logical_not(overflow)
            self.last_overflow = overflow
            # OR-accumulate on device so no overflow frame can fall between
            # the periodic samples (r4 advisor); a [] bool | is one tiny
            # async-dispatched op per frame.
            self._ovf_acc = (
                overflow
                if self._ovf_acc is None
                else _or_jit(self._ovf_acc, overflow)
            )
        else:
            self.last_overflow = None
        self.last_ok, self.last_stats, self.last_count = ok, st, el.count
        # Host-side dispatch durations (async dispatch should be ~0; a
        # blocking call here means a hidden sync — see bench --dispatch-diag)
        self.last_dispatch_ms = [
            (b - a) * 1e3 for a, b in zip(marks, marks[1:])
        ]
        self.frames += 1
        return img

    def take_overflow_acc(self):
        """Pop the accumulated steady-overflow flag (device scalar or None)
        and start its host transfer asynchronously; the caller reads the
        value a window later (stale but sync-free — CLAUDE.md fetch rule)."""
        acc = self._ovf_acc
        self._ovf_acc = None
        if acc is not None:
            try:
                acc.copy_to_host_async()
            except AttributeError:  # non-jax array (tests)
                pass
        return acc

    def try_steady_switch(self, table, view, proj, cam_pos, probes: int = 3):
        """Probe the prefiltered live count and switch to the steady set.

        Runs `probes` filtered frames (each fetches the live count — host
        syncs, so exclude from timing) and flips to steady mode if the
        filtered list fits the smaller capacity.  Returns True on switch.
        """
        if (
            not self.prefilter_on
            or self.mode == "steady"
            or self.steady_declined
        ):
            return self.mode == "steady"
        # Cheap feasibility probe first: the filtered live count via the
        # expansion-free count pipeline (compiles in seconds) — skipping
        # the steady program set's expensive compiles (the steady-capacity
        # sort alone is minutes on the remote compiler) when the scene's
        # thresholds cannot drop enough to fit.  The jit is cached on the
        # plan (a fresh lambda per call would retrace every time).
        config = self.config
        if self._count_fn is None:
            self._count_fn = jax.jit(
                lambda t, v, p, c, thr: keygen_ops.count_live_elements(
                    t, v, p, c, config, depth_thr=thr
                )
            )
        est = int(self._count_fn(table, view, proj, cam_pos, self.state.thr))
        if est >= int(self.steady_capacity * 0.97):
            self._log(
                f"steady switch skipped: filtered live ~{est/1e6:.2f}M "
                f">= {self.steady_capacity/1e6:.2f}M steady capacity"
            )
            self.steady_declined = True
            return False
        self.mode = "steady"
        for j in range(probes):
            self.frame(table, view, proj, cam_pos)
            cnt = int(self.last_count)
            self._log(
                f"  steady probe {j}: live={cnt/1e6:.2f}M/"
                f"{self.steady_capacity/1e6:.2f}M "
                f"stats={[int(v) for v in np.asarray(self.last_stats)]}"
            )
            if cnt >= self.steady_capacity:
                self.mode = "full"
                self.steady_declined = True
                self._log("steady capacity overflow; staying on full set")
                # the overflow frame dropped arbitrary elements; let the
                # temporal state re-validate on the full set
                for _ in range(2):
                    self.frame(table, view, proj, cam_pos)
                return False
        return True


class Renderer:
    """Scene-bound renderer (reference: Renderer + initForScene)."""

    # Above this capacity the monolithic frame program breaks the remote
    # TPU compiler (CLAUDE.md); the renderer switches to the chained
    # per-pass plan (ChainedTemporalPlan).
    BIG_SCENE_CAPACITY = 6_000_000
    # Frames of full-capacity warmup before the chained plan probes the
    # depth-prefilter steady switch (caps/threshold convergence takes
    # <= log2(cap_max / cap) escalations plus margin-growth frames).
    WARMUP_FRAMES = 14

    def __init__(
        self,
        config: RenderConfig,
        *,
        use_pallas_blend: bool | None = None,
        steady_frac: float = 0.51,
    ):
        self.config = config
        if use_pallas_blend is None:
            use_pallas_blend = jax.default_backend() == "tpu"
        self.use_pallas_blend = use_pallas_blend
        # Temporal per-tile caps (production blend policy): used whenever the
        # Pallas blend is on and blend_depth_cap > 0.  The caps array is the
        # renderer's only cross-frame state (reset per scene).
        self.temporal_caps = use_pallas_blend and config.blend_depth_cap > 0
        self.steady_frac = steady_frac
        self._caps = None
        self._ovf_pending = None  # previous window's overflow acc (async)
        self._plan: ChainedTemporalPlan | None = None
        self.table: GaussianTable | None = None
        self.capacity: int | None = None

    def init_for_scene(self, table: GaussianTable) -> None:
        """Upload the gaussian table and fix static sizes (Renderer.cpp:712)."""
        self.capacity = self.config.sort_capacity(table.num_gaussians)
        self._caps = None  # temporal caps reset on scene swap
        self._ovf_pending = None
        self._plan = None
        if self.temporal_caps and self.capacity > self.BIG_SCENE_CAPACITY:
            self._plan = ChainedTemporalPlan(
                self.config,
                self.capacity,
                steady_frac=self.steady_frac,
            )
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
        if self._plan is not None:
            # Big-scene production path: chained per-pass dispatch with the
            # temporal capped blend and the depth-prefilter steady set.
            args = (
                self.table,
                jnp.asarray(view),
                jnp.asarray(proj),
                jnp.asarray(camera.position, dtype=jnp.float32),
            )
            if (
                self._plan.mode == "full"
                and self._plan.prefilter_on
                and self._plan.frames >= self.WARMUP_FRAMES
            ):
                self._plan.try_steady_switch(*args)
            image = self._plan.frame(*args)
            if self._plan.mode == "steady" and self._plan.frames % 8 == 0:
                # Overflow check, fetch-free: pop the device-accumulated
                # OR of the last window's overflow flags (no frame can slip
                # between samples) and read the PREVIOUS window's flag,
                # whose async host copy has had a full window to land —
                # bool() then returns without serializing the dispatch
                # queue (the +28 ms/fetch tunnel tax, CLAUDE.md/r4 advisor).
                pending = self._plan.take_overflow_acc()
                stale = self._ovf_pending
                self._ovf_pending = pending
                if stale is not None and bool(stale):
                    # Filtered live outgrew the steady capacity (camera
                    # moved into a denser region): those frames were
                    # flagged not-ok; revert to the full set and allow a
                    # later re-probe.
                    self._plan.mode = "full"
                    self._plan.steady_declined = False
                    self._ovf_pending = None
            return FrameOutputs(
                image_u8=_quantize_jit(image),
                image=image,
                num_elements=self._plan.last_count,
                ok=self._plan.last_ok,
            )
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
