"""Render configuration — the TPU-native replacement for the reference's
compile-time tunables.

The reference scatters its configuration across preprocessor defines
(`TILE_SIZE` Renderer.h:146 / Common.glsl:12, `GPU_SORT_ALGORITHM`
Renderer.h:33), class-scope constants (`Camera::NEAR_PLANE/FAR_PLANE`
Camera.cpp:4-5, `FOV_Y` Common.glsl:2) and SPIR-V specialization constants
(Shader.cpp:27-50).  Here they are a single frozen dataclass whose fields are
*static* under `jax.jit` — tracing a pipeline against a config plays the same
role as specializing a SPIR-V pipeline against spec constants: one compiled
executable per distinct config.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class SphericalHarmonicsMode(enum.IntEnum):
    """SH evaluation modes, hotkeys 1/2/3 in the reference (Camera.h:7-12)."""

    ALL_BANDS = 0
    SKIP_FIRST_BAND = 1
    ONLY_FIRST_BAND = 2


class SortAlgorithm(enum.Enum):
    """Sort strategy selection (reference: `GPU_SORT_ALGORITHM`, Renderer.h:33).

    XLA_SORT  — `jax.lax.sort` on the (tile, depth) words + the index as a
                deterministic third key (order-equal to stable, ~20% faster;
                argument in ops/sort.py).  The production tier on TPU: the
                reference's role-equivalent of RadixSort.  There is no
                Pallas LSD-radix tier on this stack BY MEASUREMENT — every
                radix formulation (per-run scatter stores, crossbar
                permutes, chunked merges) prices above lax.sort on the
                probed v5e primitives (85 ns / [8,128] crossbar, ~600 ns
                small-DMA issue, ~6 ns/row gather); the probe table and
                design-space analysis live in docs/PERFORMANCE.md.
    BITONIC   — bitonic merge network (the reference's alternative backend,
                BitonicMergeSort.{h,cpp}); requires power-of-two capacity.
    AUTO      — XLA_SORT everywhere (kept for config compatibility).
    """

    XLA_SORT = "xla_sort"
    BITONIC = "bitonic"
    AUTO = "auto"


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def ceil_pow_two(x: int) -> int:
    """Reference: Renderer::getCeilPowTwo (Renderer.cpp:703-710)."""
    num = 1
    while num < x:
        num *= 2
    return num


def min_num_bits(x: int) -> int:
    """Number of bits needed to represent x (RadixSort::getMinNumBits)."""
    return max(x.bit_length(), 1)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static per-scene/per-resolution render configuration.

    Mirrors the reference tunables:
      - tile_size:   TILE_SIZE=16 (Renderer.h:146, Common.glsl:12)
      - near/far:    Camera::NEAR_PLANE=0.1 / FAR_PLANE=100 (Camera.cpp:4-5)
      - fov_y:       FOV_Y = pi/2 (Common.glsl:2). The reference hard-codes
                     3.1415f*0.5f (not math.pi!) in the shader but uses
                     glm::radians(90.0) for the projection matrix; both are kept
                     faithfully distinct here.
      - culling_ndc_limit: CULLING_NDC_LIMIT=1.3 (Common.glsl:5)
      - in_view_limit:     IN_VIEW_LIMIT=0.8 (Common.glsl:9)
      - covariance_dilation: +0.3 on cov.x/cov.z (Common.glsl:73-75)
      - alpha_cutoff / transmittance_stop: RenderGaussians.comp:127,136
    """

    width: int = 1280
    height: int = 720
    tile_size: int = 16
    near_plane: float = 0.1
    far_plane: float = 100.0
    # Shader-side FOV constant (Common.glsl:2): 3.1415f * 0.5f, NOT math.pi/2.
    shader_fov_y: float = 3.1415 * 0.5
    # Projection-matrix FOV (Camera.cpp:42): glm::radians(90.0).
    proj_fov_y: float = math.radians(90.0)
    culling_ndc_limit: float = 1.3
    in_view_limit: float = 0.8
    covariance_dilation: float = 0.3
    alpha_cutoff: float = 1.0 / 255.0
    transmittance_stop: float = 1.0e-4
    sh_mode: SphericalHarmonicsMode = SphericalHarmonicsMode.ALL_BANDS
    sort_algorithm: SortAlgorithm = SortAlgorithm.AUTO
    # Sort-element capacity multiplier; reference formula is
    # ceilPow2(numGaussians + 64*16*numTiles) (Renderer.cpp:725).
    capacity_slack_per_tile: int = 64 * 16
    # Pad capacity to the next power of two like the reference (needed by its
    # bitonic path; kept for behavioural parity, optional otherwise).
    capacity_pow_two: bool = True
    # Element-expansion strategy in keygen:
    #   "pallas"  — windowed Pallas kernel (ops/pallas/expand_kernel.py):
    #               compare-count + vreg crossbar gathers; no XLA scatter,
    #               no per-row gather.  Production tier on TPU.  (A
    #               paired-window 2-windows-per-crossbar variant was built
    #               and retired in r4: the kernel is per-window-overhead
    #               bound, not crossbar bound, so window sizing supersedes
    #               pairing — docs/PERFORMANCE.md.)
    #               Under a prefilter (thinned counts) "pallas" dispatches
    #               to the streamed-window kernel below automatically.
    #   "stream"  — streamed-window Pallas kernel: STREAM_K windows per
    #               grid step backed by ONE contiguous chunk-buffer DMA
    #               (double-buffered across steps); per-window compute
    #               identical to "pallas", the per-window DMAs and grid
    #               overhead amortized away.  Wins in the thinned
    #               (prefilter steady) regime (r5: 20.9 vs 25.5 ms); the
    #               dense regime keeps the per-window kernel (its fixed
    #               chunk buffer over-fetches when spans fit one chunk).
    #   "repeat"  — jnp.repeat (XLA scatter + one ~6.5 ns/row gather).
    #   "auto"    — pallas on TPU (stream under a prefilter), repeat
    #               elsewhere.
    expansion_method: str = "auto"
    # Pallas blend batch width (elements per cooperative batch; the
    # reference's ENTIRE_GROUP_SIZE=256 widened to fill VPU lanes).  Must be
    # a multiple of 128 (DMA lane alignment).  Smaller batches waste fewer
    # trailing lanes on short tile ranges at the cost of more DMAs; the
    # exclusive cumprod is log2(bk) [256, bk] multiplies per batch.  v5e
    # sweep 256/512/768/1024 = 45.8/39.1/36.2/48.5 ms at garden steady
    # state (2026-08-21, r4) -> 768.
    blend_batch_k: int = 768
    # Saturation-truncation cap (ops/capped.py): > 0 blends only each tile's
    # first `cap` sorted elements and gathers features for those alone,
    # falling back in-graph to the full blend when any tile is not provably
    # exact (range fit the cap, or all pixels saturated).  0 disables.
    # Exactness argument + float-regrouping caveat in ops/capped.py.
    blend_depth_cap: int = 0
    # Upper bound for per-tile temporal caps (ops/capped.py temporal
    # policy); also the static DMA window of the run compactor.  Multiple
    # of 128.  Tiles needing more than this never validate and force the
    # full-blend fallback every frame.
    blend_cap_max: int = 4096
    # Packed-layout budget per tile beyond roundup(blend_depth_cap, 128)
    # for the temporal policy (escalated tiles + alignment).  The packed
    # size is STATIC, so gather/blend cost scales with this directly.
    packed_slack_per_tile: int = 256
    # Temporal-caps escalation margin: a saturation-valid tile (r > cap)
    # keeps escalating until its per-pixel T at the cap is below
    # transmittance_stop * this factor.  Validity (the exact fallback
    # decision) stays at transmittance_stop; the margin only gives the
    # converged caps headroom so small per-frame camera motion cannot flip
    # marginal tiles invalid (one invalid tile costs a full-blend
    # fallback frame).  Margin-driven growth is gentle (+128 per frame vs
    # the 2x jump for genuinely invalid tiles) so the packed budget
    # converges instead of overshooting into overflow-decay limit cycles.
    cap_escalate_margin: float = 0.3
    # Depth-threshold publication bar (ops/prefilter.py), as a multiple of
    # transmittance_stop: a valid tile publishes its capped-end depth as
    # the next frame's prefilter threshold when every pixel's T is below
    # stop * this factor.  Sits between the escalation margin (0.3x, the
    # caps' convergence target) and the validation bar (4x): publishing at
    # 1.0 keeps a 4x transmittance band against motion-induced validation
    # failures while covering far more tiles than the margin bar would
    # (fog measurement r4: margin-bar publication reached only 59% of
    # tiles because the packed budget stalls cap growth).
    thr_publish_margin: float = 1.0
    # Saturation-driven cap decay (the packed-occupancy controller): a
    # truncating tile whose end-of-cap transmittance is below
    # transmittance_stop * cap_escalate_margin * THIS factor decays its cap
    # by 128/frame — the cap walks down toward the true saturation depth
    # instead of pinning whatever the escalation overshot.  The decayed cap
    # might undershoot (T is only known at the current end); validation
    # catches that (patched frame + 2x re-escalation), and the ~600x
    # transmittance band between the decay stop and validation failure
    # makes it rare.  Gather/blend/layout cost scales with steady packed
    # occupancy, so this is a direct perf knob.  0 disables.
    cap_decay_margin: float = 0.02
    # Temporal-caps VALIDATION threshold, as a multiple of
    # transmittance_stop.  A capped tile passes when every pixel's T at the
    # cap is below stop * this factor; the dropped tail is therefore
    # <= stop * factor per pixel (4e-4 default) — ~1/10 of an 8-bit step,
    # the same error class the reference's own per-pixel early-out
    # discards (it stops at T < 1e-4 and drops everything after).
    # Decoupling validation (4x stop) from the escalation target
    # (0.3x stop) puts a 13x hysteresis band between them, so per-frame
    # camera motion cannot flip marginal tiles in and out of validity
    # (1-3 flipping tiles cost a full-blend fallback frame each).  The
    # blend kernel's in-loop early-out semantics still use
    # transmittance_stop exactly.  Bound documented in docs/TOLERANCES.md.
    cap_validation_factor: float = 4.0
    # Damped prefilter-threshold reset (r5, VERDICT r4 #4): when a filtered
    # tile must stop filtering (validation miss, or it no longer clears the
    # publication bar), snap-resetting thr to SENTINEL re-admits the tile's
    # ENTIRE dropped tail next frame — thousands of tiles churning this way
    # spike the filtered live count past tight steady capacities (the
    # measured steady-frac 0.54 instability, BENCH_EXTRA r4).  With damping
    # on, the threshold instead DOUBLES per frame (monotonically admitting
    # more depth — always conservative-safe, see ops/prefilter.py; depth
    # keys compress the scene toward small values, so doubling is
    # geometric in content depth where a halfway-to-SENTINEL step is
    # effectively a snap), with an additive floor for progress and a snap
    # at half the key range (<= ~6 ramp frames from any threshold).
    # Validation-missed filtered tiles are still flagged not-ok while the
    # ramp runs.
    thr_reset_damp: bool = True

    # ----- derived static quantities --------------------------------------

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def grid_width(self) -> int:
        """Tiles along x (Renderer::getNumTiles, Renderer.cpp:696-701)."""
        return ceil_div(self.width, self.tile_size)

    @property
    def grid_height(self) -> int:
        return ceil_div(self.height, self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.grid_width * self.grid_height

    def sort_capacity(self, num_gaussians: int) -> int:
        """Reference: Renderer.cpp:725."""
        cap = num_gaussians + self.capacity_slack_per_tile * self.num_tiles
        if self.capacity_pow_two:
            cap = ceil_pow_two(cap)
        return cap

    @property
    def num_tile_bits(self) -> int:
        """Bits needed for the tile id (RadixSort.cpp:203)."""
        return max((self.num_tiles - 1).bit_length(), 1)

    def num_sort_bits(self, bits_per_pass: int = 4) -> int:
        """Used key bits rounded up to the pass size (RadixSort.cpp:203-204)."""
        sort_bits = 32 + self.num_tile_bits
        return ceil_div(sort_bits, bits_per_pass) * bits_per_pass

    def with_resolution(self, width: int, height: int) -> "RenderConfig":
        return dataclasses.replace(self, width=width, height=height)


# Sentinel tile key marking unused sort-list capacity.  The reference clears
# the sort list to 0xFFFFFFFF (Subrenderer.cpp:42-46) so sentinels sort last
# and FindRanges skips them (FindRanges.comp:32-39).
SENTINEL = 0xFFFFFFFF

# 2^32 - 1 (MAX_UINT32 in Common.glsl:15)
MAX_UINT32 = 0xFFFFFFFF
