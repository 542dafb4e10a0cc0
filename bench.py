"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: Garden-30k-scale frame time at 1920x1080 on one TPU chip
(reference: 28.499 ms on an RTX 3080 Ti, BASELINE.md row Garden-30k@1080p).

Protocol notes:
  * The real Garden .ply is not redistributable; the scene is a procedural
    cloud with the same gaussian count whose scale distribution is
    *calibrated on device* so the frame's live sort-element count matches the
    reference row (13.1M) within a few percent.
  * The axon tunnel neither blocks on dispatch nor observes completion
    without a fetch, and has ~28 ms RTT; frames are therefore timed by an
    in-jit `lax.fori_loop` over F frames (camera perturbed per iteration so
    nothing is cached/elided), fetching one scalar digest, and subtracting
    the one-frame run.  This mirrors the reference's warmup+average protocol
    (Renderer.cpp:477-487) with the averaging done on device.
"""

import argparse
import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINES_MS = {
    "garden30k_1080p": 28.499,
    "garden30k_720p": 19.052,
    "train30k_1080p": 22.034,
    "train7k_720p": 8.581,
}
SCENES = {
    # name: (num_gaussians, width, height, target_elements)
    "garden30k_1080p": (5_834_784, 1920, 1080, 13_098_506),
    "garden30k_720p": (5_834_784, 1280, 720, 8_903_222),
    "train30k_1080p": (1_026_508, 1920, 1080, 10_145_054),
    "train7k_720p": (559_263, 1280, 720, 3_487_911),
    # tiny smoke config for CPU / CI runs (baseline scaled from train7k)
    "debug_small": (20_000, 256, 256, 60_000),
}
BASELINES_MS["debug_small"] = 1.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_blend_fn(config, blend_mode):
    """blend_mode: 'tiled' | 'flat' | 'capped' | 'xla'.

    'capped' is the temporal per-tile-caps policy: the returned callable
    takes (elements, ranges, frame, caps) and returns (img, caps_next, ok);
    all other modes take (elements, ranges, frame) and return img.
    """
    if blend_mode == "xla":
        from vk3dgaussiansplatting_tpu.ops import blend as blend_ops

        return lambda el, r, fr: blend_ops.blend_tiles_xla(el, r, fr, config)
    if blend_mode == "capped":
        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops

        assert config.blend_depth_cap > 0
        return lambda el, r, fr, caps: capped_ops.blend_tiles_capped_temporal(
            el, r, fr, config, caps
        )
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel

    if blend_mode == "flat":
        return lambda el, r, fr: blend_kernel.blend_tiles_pallas_flat(
            el, r, fr, config
        )
    return lambda el, r, fr: blend_kernel.blend_tiles_pallas(el, r, fr, config)


def build_frame_fn(config, capacity, blend_mode):
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops

    blend = make_blend_fn(config, blend_mode)

    def frame(table, view, proj, cam_pos, caps=None):
        elements, frame_data = keygen_ops.generate_sort_elements(
            table, view, proj, cam_pos, config, capacity
        )
        elements = sort_ops.sort_elements(elements, config)
        ranges = ranges_ops.find_ranges(elements, config.num_tiles)
        if blend_mode == "capped":
            image, caps_next, ok = blend(elements, ranges, frame_data, caps)
            return image, elements.count, caps_next, ok
        image = blend(elements, ranges, frame_data)
        return image, elements.count

    return frame


def calibrate_scale(table_host, cam, config, capacity, target_elements):
    """Binary-search a log-scale offset so live elements ~= target."""
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops

    view, proj = cam.matrices()
    base = jax.device_put(
        GaussianTable(
            position=jnp.asarray(table_host.position),
            scale=jnp.asarray(table_host.scale),
            rot=jnp.asarray(table_host.rot),
            sh=jnp.asarray(table_host.sh),
            opacity=jnp.asarray(table_host.opacity),
        )
    )
    vj, pj, cj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)

    # The table rides as an EXPLICIT jit argument: closure-captured device
    # arrays embed as HLO constants and hang the remote compile helper
    # (CLAUDE.md; re-observed on the calibration program 2026-08-21).
    # Also: only the element COUNT is needed, so this runs the count
    # pipeline (projection + extents + cumsum), not the full keygen with
    # its expansion kernel — far cheaper to compile and run.
    @jax.jit
    def count_at(mult, base):
        from vk3dgaussiansplatting_tpu.render import project as prj

        pos_view = prj.view_transform(base.position, vj)
        ndc = prj.ndc_position(pos_view, pj)
        visible = keygen_ops.cull_mask(pos_view, ndc, config)
        cov2d = prj.compute_cov2d(
            base.scale * mult, base.rot, pos_view, vj, config
        )
        sp = prj.screen_space_position(pos_view, pj, config)
        ext = prj.tile_extents(sp, cov2d, config)
        w = ext[:, 2] - ext[:, 0]
        h = ext[:, 3] - ext[:, 1]
        counts = jnp.where(visible, w * h, 0).astype(jnp.int32)
        return jnp.minimum(jnp.sum(counts), capacity).astype(jnp.uint32)

    lo, hi = 0.05, 20.0
    mult = 1.0
    for _ in range(12):
        mult = math.sqrt(lo * hi)
        c = int(count_at(jnp.float32(mult), base))
        if abs(c - target_elements) / target_elements < 0.03:
            break
        if c < target_elements:
            lo = mult
        else:
            hi = mult
    final = int(count_at(jnp.float32(mult), base))
    return mult, final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="garden30k_1080p", choices=SCENES)
    ap.add_argument("--frames", type=int, default=48)  # 16-frame runs on
    # the monolithic path have shown internally-inconsistent timings
    # (t(17) too small vs t(1) + 16x steady); 48 frames amortize any
    # fixed-cost anomaly to <2%
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--sort", default="xla", choices=["xla", "bitonic"])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--blend", default="auto",
                    choices=["auto", "tiled", "flat", "capped", "xla"])
    ap.add_argument("--cap", type=int, default=384,
                    help="base per-tile cap for --blend capped (temporal "
                         "policy escalates per tile up to --cap-max)")
    ap.add_argument("--cap-max", type=int, default=4096)
    ap.add_argument("--opacity-mode", default="capture",
                    choices=["capture", "translucent"],
                    help="procedural-scene opacity distribution (translucent "
                         "= the round-1 setting, kept for A/B comparability)")
    ap.add_argument("--slack", type=int, default=None,
                    help="capacity_slack_per_tile override (reference: 1024; "
                         "a tighter value shrinks every per-slot pass — "
                         "results stay exact as long as nothing overflows, "
                         "which the live-element log confirms)")
    ap.add_argument("--steady-frac", type=float, default=0.51,
                    help="temporal depth-prefilter steady-state capacity, "
                         "as a fraction of the full sort capacity: after "
                         "the caps/thresholds warmup, keygen drops "
                         "past-saturation gaussians and every per-element "
                         "pass (expansion/sort/ranges) re-compiles at this "
                         "smaller static capacity.  0 disables the "
                         "prefilter (round-3 behavior).")
    ap.add_argument("--no-prefilter", action="store_true",
                    help="alias for --steady-frac 0")
    ap.add_argument("--thr-margin", type=float, default=None,
                    help="thr_publish_margin override (default 1.0): lower "
                         "publishes fewer, deeper-saturated thresholds — "
                         "a wider hysteresis band against motion-induced "
                         "prefilter-miss flags")
    ap.add_argument("--bk", type=int, default=None,
                    help="blend_batch_k override (default 768; smaller "
                         "scenes may prefer 512 — shorter tile ranges "
                         "waste fewer trailing batch lanes)")
    ap.add_argument("--packed-slack", type=int, default=None,
                    help="packed_slack_per_tile override (default 256): the "
                         "static packed-layout budget per tile beyond the "
                         "base cap.  Gather + blend cost scales with the "
                         "static packed capacity, so with the saturation-"
                         "decay controller holding steady occupancy ~5.1M "
                         "a smaller budget converts directly into frame "
                         "time (at the cost of margin-growth headroom).")
    ap.add_argument("--scene-gen", default="cloud",
                    choices=["cloud", "surface", "ply-surface"],
                    help="procedural stand-in generator: random cloud "
                         "(calibrated default), surface-structured "
                         "(clustered tangential disks, bimodal opacity — "
                         "closer saturation/overlap statistics to real "
                         "captures), or ply-surface (the surface scene "
                         "exported as a capture-format binary .ply and "
                         "loaded back through the full ResourceManager-"
                         "equivalent path: native parser, activations, "
                         "Morton sort)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU platform is "
                         "the default even without hardware flags; local "
                         "smoke runs MUST use this — a second concurrent "
                         "TPU client wedges the tunnel, CLAUDE.md)")
    ap.add_argument("--single-scene", action="store_true",
                    help="bench only --scene (default garden runs also "
                         "record train7k_720p so driver artifacts catch "
                         "cross-scene regressions, VERDICT r4 #5)")
    ap.add_argument("--no-image-check", action="store_true",
                    help="skip the end-of-run TPU-vs-CPU-reference image "
                         "diff (VERDICT r4 #7)")
    ap.add_argument("--ref-frame-out", default=None,
                    help="INTERNAL (spawned with --cpu by the image check): "
                         "render ONE reference frame of --scene at "
                         "--ref-eps on the CPU XLA tier (strip-chunked) "
                         "and save the quantized u8 image to this .npy")
    ap.add_argument("--ref-eps", type=float, default=0.0)
    ap.add_argument("--crossdata", default=None,
                    help="INTERNAL (spawned with --cpu by the image check): "
                         "blend the TPU-fetched element/frame arrays in "
                         "this .npz through the CPU f64 reference tier and "
                         "print a one-line JSON diff verdict vs the npz's "
                         "TPU image")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.ref_frame_out is not None:
        assert args.cpu, "--ref-frame-out is a CPU-only mode"
        ref_frame_main(args)
        return
    if args.crossdata is not None:
        assert args.cpu, "--crossdata is a CPU-only mode"
        crossdata_main(args)
        return

    # Multi-scene recording (VERDICT r4 #5): the default garden invocation
    # also benches train7k_720p so BENCH_r{N}.json carries both lines.
    scenes = [args.scene]
    if (
        not args.single_scene
        and args.scene == "garden30k_1080p"
        and not args.cpu
        and args.scene_gen == "cloud"
    ):
        scenes.append("train7k_720p")
    results = []
    for s in scenes:
        try:
            results.append(run_scene(args, s))
        except BaseException:
            # Don't orphan a spawned CPU reference renderer when the
            # bench dies mid-scene (remote-compile deaths are a known
            # event class); _REF_PROCS is appended by run_scene.
            for p in _REF_PROCS:
                try:
                    p.kill()
                except Exception:
                    pass
            raise
    result = dict(results[0])
    if len(results) > 1:
        result["scenes"] = {
            r["metric"]: {
                "value": r["value"],
                "vs_baseline": r["vs_baseline"],
                **(
                    {"image_ok": r["image_ok"]} if "image_ok" in r else {}
                ),
            }
            for r in results
        }
    try:
        import os as _os

        _os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/bench_scenes.json", "w") as f:
            json.dump(results, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result), flush=True)


def build_config(args, scene, blend_mode):
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm

    _n, width, height, target_elems = SCENES[scene]
    packed_slack = args.packed_slack
    if packed_slack is None and target_elems <= 6_000_000:
        # Small (monolithic, non-prefilter) scenes: a tighter packed budget
        # is a pure blend/gather win (train7k 61.5 -> 56.6 ms, r5).  BIG
        # scenes must keep the default headroom: the cap controller's
        # margin growth is budget-gated, and a tight budget throttles
        # threshold publication until the prefilter cannot drop enough to
        # fit the steady capacity (slack 128 at garden: filtered live
        # 7.97M vs 5.9M, steady switch DECLINED, 205.7 ms vs 195.8).
        packed_slack = 128
    args = argparse.Namespace(**{**vars(args), "packed_slack": packed_slack})
    return RenderConfig(
        width=width,
        height=height,
        sort_algorithm=SortAlgorithm.BITONIC
        if args.sort == "bitonic"
        else SortAlgorithm.XLA_SORT,
        # Perf: skip the reference's pow2 rounding of the capacity (only its
        # bitonic backend needs it; nearly halves all per-element costs).
        capacity_pow_two=False,
        blend_depth_cap=args.cap if blend_mode == "capped" else 0,
        blend_cap_max=args.cap_max,
        **(
            {"capacity_slack_per_tile": args.slack}
            if args.slack is not None
            else {}
        ),
        **(
            {"packed_slack_per_tile": args.packed_slack}
            if args.packed_slack is not None
            else {}
        ),
        **({"blend_batch_k": args.bk} if args.bk is not None else {}),
        **(
            {"thr_publish_margin": args.thr_margin}
            if args.thr_margin is not None
            else {}
        ),
    )


def build_scene(args, scene, config, capacity):
    """Scene-gen build + benchmark camera + calibration memo; returns
    (host_table, cam, mult, live).  Deterministic in (scene, seed,
    generator, opacity mode), shared by run_scene and ref_frame_main so
    the CPU reference renders EXACTLY the benched scene."""
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_cloud_table,
        procedural_surface_table,
    )

    n_gauss, width, height, target_elems = SCENES[scene]
    t0 = time.time()
    if args.scene_gen == "ply-surface":
        # Capture-format round trip: export the surface scene as a binary
        # .ply once, then load it through the full ResourceManager-
        # equivalent path (native parser + activations + Morton sort,
        # io/ply.py:load_gaussians) — the reference's prime artifact flow
        # (ResourceManager.cpp:167-300 + GardenScene.cpp:9-16).
        import os as _os

        from vk3dgaussiansplatting_tpu.io.ply import (
            load_gaussians,
            write_gaussian_ply,
        )

        # v-token: bump with generator/exporter changes so a stale cached
        # capture cannot skew cross-round comparisons (same bug class as
        # the calibration memo's cal_schema)
        ply_path = _os.path.expanduser(
            f"~/.cache/vk3dgs_surface_{n_gauss}_{args.seed}_v1.ply"
        )
        if not _os.path.exists(ply_path):
            t = procedural_surface_table(n_gauss, seed=args.seed)
            log(f"exporting surface capture -> {ply_path}")
            write_gaussian_ply(ply_path, t)
            del t
        host_table = load_gaussians(ply_path)
        log(f"loaded {host_table.num_gaussians} gaussians from .ply "
            f"(native parser + Morton) in {time.time()-t0:.1f}s")
    elif args.scene_gen == "surface":
        host_table = procedural_surface_table(n_gauss, seed=args.seed)
    else:
        host_table = procedural_cloud_table(
            n_gauss, seed=args.seed, opacity_mode=args.opacity_mode
        )
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    log(f"scene built in {time.time()-t0:.1f}s; capacity={capacity}")

    # The scene build is deterministic in (scene, seed, generator, opacity
    # mode), so the calibrated multiplier is too: memoize it on disk.  The
    # calibration loop is the bench's most tunnel-exposed phase (13
    # synchronous fetches; observed 48 s to 10+ min depending on tunnel
    # mood), and skipping it makes driver re-runs faster and sturdier.
    import os

    # Schema token: bump when the scene generators, culling, or the count
    # formula change, so a stale memoized multiplier cannot silently skew
    # cross-round comparisons (advisor r3).
    cal_schema = 2
    cal_key = (f"{scene}-{args.seed}-{args.scene_gen}-"
               f"{args.opacity_mode}-{capacity}-v{cal_schema}")
    cal_path = os.path.expanduser(f"~/.cache/vk3dgs_cal_{cal_key}.txt")
    t0 = time.time()
    if os.path.exists(cal_path):
        with open(cal_path) as f:
            mult, live = f.read().split()
        mult, live = float(mult), int(live)
        log(f"calibration memo: scale x{mult:.3f} -> {live/1e6:.2f}M live "
            f"elements ({cal_path})")
    else:
        mult, live = calibrate_scale(
            host_table, cam, config, capacity, target_elems
        )
        log(f"calibrated scale x{mult:.3f} -> {live/1e6:.2f}M live elements "
            f"(target {target_elems/1e6:.2f}M) in {time.time()-t0:.0f}s")
        try:
            os.makedirs(os.path.dirname(cal_path), exist_ok=True)
            with open(cal_path, "w") as f:
                f.write(f"{mult} {live}")
        except OSError:
            pass
    return host_table, cam, mult, live


_REF_PROCS = []  # live CPU-reference subprocesses (killed on bench death)


def run_scene(args, scene):
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable

    n_gauss, width, height, target_elems = SCENES[scene]
    on_tpu = jax.default_backend() == "tpu"
    blend_mode = args.blend
    if blend_mode == "auto":
        # Temporal per-tile caps are the production schedule (round 3): the
        # capture-like scene saturates deeply (sat-diag 2026-08-21: 99.98%
        # of tiles exact at cap 1024), caps converge within a few warmup
        # frames, and steady-state frames skip both the full feature gather
        # and the fallback entirely.
        blend_mode = "capped" if (on_tpu and not args.no_pallas) else "xla"
    config = build_config(args, scene, blend_mode)
    log(f"bench scene={scene} n={n_gauss} {width}x{height} "
        f"target_elems={target_elems} blend={blend_mode} sort={args.sort}")
    capacity = config.sort_capacity(n_gauss)
    host_table, cam, mult, live = build_scene(args, scene, config, capacity)

    # TPU-at-scale image verification (VERDICT r4 #7): spawn the CPU
    # reference-frame subprocess NOW (it never touches the TPU tunnel, so
    # it legally runs concurrently with the benchmark) and diff one
    # steady-state frame against it at the end.
    ref_proc = ref_path = None
    image_check = (
        not args.no_image_check
        and on_tpu
        and blend_mode == "capped"
        and args.ref_frame_out is None
    )
    if image_check:
        import os as _os
        import subprocess

        ref_schema = 3
        ref_key = (f"{scene}-{args.seed}-{args.scene_gen}-"
                   f"{args.opacity_mode}-{capacity}-{args.sort}-"
                   f"e0-v{ref_schema}")
        ref_path = _os.path.expanduser(f"~/.cache/vk3dgs_ref_{ref_key}.npy")
        if not _os.path.exists(ref_path):
            cmd = [
                sys.executable, "-u", __file__, "--cpu",
                "--scene", scene, "--scene-gen", args.scene_gen,
                "--seed", str(args.seed), "--opacity-mode", args.opacity_mode,
                "--sort", args.sort, "--ref-eps", "0.0",
                "--ref-frame-out", ref_path,
            ]
            if args.slack is not None:
                cmd += ["--slack", str(args.slack)]
            log(f"image-check: spawned CPU reference renderer -> {ref_path}")
            ref_proc = subprocess.Popen(
                cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
            )
            _REF_PROCS.append(ref_proc)

    table = jax.device_put(
        GaussianTable(
            position=jnp.asarray(host_table.position),
            scale=jnp.asarray(host_table.scale * np.float32(mult)),
            rot=jnp.asarray(host_table.rot),
            sh=jnp.asarray(host_table.sh),
            opacity=jnp.asarray(host_table.opacity),
        )
    )
    del host_table
    view, proj = cam.matrices()
    vj, pj, cj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)
    frame = build_frame_fn(config, capacity, blend_mode)

    # Timing protocol: the axon tunnel neither blocks on dispatch nor
    # observes completion without a fetch (~28 ms RTT), so frames are
    # dispatched back-to-back (async, serialized on the one core) and ONE
    # scalar digest of the last frame is fetched; the one-frame run is
    # subtracted to cancel the dispatch+fetch overhead.  A monolithic
    # in-jit `fori_loop` over frames was the previous protocol, but its
    # single huge program broke the remote compile helper at garden scale
    # (transport broken-pipe after ~25 min, 2026-08-20); per-frame dispatch
    # compiles the same per-pass programs the pass bench already caches.

    capped_mode = blend_mode == "capped"
    steady_frac = 0.0 if args.no_prefilter else args.steady_frac
    # The prefilter needs the chained plan (filtered keygen), which only
    # big scenes use; small scenes' monolithic frame must not pay the
    # CapsState machinery (crossing search + threshold publication) for a
    # filter that never runs (train7k A/B: 62.0 with vs ~50 without, r4).
    big_scene = on_tpu and target_elems > 6_000_000
    prefilter_on = capped_mode and steady_frac > 0 and big_scene
    if capped_mode:
        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops

        # CapsState carries (caps, thr, floor): the temporal caps plus the
        # depth-prefilter thresholds published by margin-deep tiles.
        caps_cell = [
            capped_ops.init_caps_state(config)
            if prefilter_on
            else capped_ops.init_caps(config)
        ]
        ok_cell = [[], 0, None]  # per-frame ok device scalars, frames, stats
    count_cell = [None]  # last frame's device element count

    img_cell = [None, None]  # last frame's device (u8 image, ok) if tracked

    @jax.jit
    def frame_digest_raw(eps, caps):
        from vk3dgaussiansplatting_tpu.ops import blend as blend_ops

        v2 = vj.at[2, 3].add(eps)  # perturb so nothing constant-folds
        if capped_mode:
            img, count, caps_next, ok = frame(table, v2, pj, cj, caps)
        else:
            img, count = frame(table, v2, pj, cj)
            caps_next, ok = caps, jnp.bool_(True)
        d = jnp.sum(img[::97, ::97, 0]) + count.astype(jnp.float32) * jnp.float32(1e-9)
        # u8 image rides as an (unfetched) output for the end-of-run image
        # check — a [H,W,4] u8 store is noise next to the frame itself.
        return d, caps_next, blend_ops.quantize_image(img), ok

    def frame_digest(eps):
        # Temporal caps ride between frames as device arrays (no host sync).
        caps = caps_cell[0] if capped_mode else jnp.int32(0)
        d, caps_next, img_u8, ok = frame_digest_raw(eps, caps)
        if capped_mode:
            caps_cell[0] = caps_next
        img_cell[0], img_cell[1] = img_u8, ok
        return d

    dig = jax.jit(
        lambda img, count: jnp.sum(img[::97, ::97, 0])
        + count.astype(jnp.float32) * jnp.float32(1e-9)
    )

    _view_cache = {}

    def view_of(eps):
        # Host-side camera perturbation (so nothing constant-folds across
        # frames), CACHED on device: a per-frame host->device transfer
        # costs ~1 ms over the axon tunnel (r4: ~50 ms of unexplained
        # frame overhead traced to exactly this).
        key = float(np.float32(eps))
        if key not in _view_cache:
            v = np.array(view, dtype=np.float32)
            v[2, 3] += np.float32(key)
            _view_cache[key] = jax.device_put(jnp.asarray(v))
        return _view_cache[key]

    plan_cell = [None]

    def make_plan_dispatch():
        """The production big-scene path: pipeline.ChainedTemporalPlan
        (per-pass chained dispatch + temporal CapsState + prefilter steady
        set) — the same code `Renderer.draw` runs, driven by the bench's
        fetch-free protocol."""
        from vk3dgaussiansplatting_tpu.pipeline import ChainedTemporalPlan

        plan = ChainedTemporalPlan(
            config, capacity, steady_frac=steady_frac, log=log
        )
        plan.keep_intermediates = True  # for the end-of-run image check
        plan_cell[0] = plan
        caps_cell[0] = plan.state  # share telemetry with the warmup logs

        from vk3dgaussiansplatting_tpu.ops import blend as blend_ops

        q8 = jax.jit(blend_ops.quantize_image)
        ovf_pending = [None]

        def dispatch_fn(eps):
            img = plan.frame(table, view_of(float(eps)), pj, cj)
            caps_cell[0] = plan.state
            # device scalars accumulate host-side (zero per-frame device
            # ops); summed once at the end
            ok_cell[0].append(plan.last_ok)
            ok_cell[1] += 1
            ok_cell[2] = plan.last_stats
            count_cell[0] = plan.last_count
            img_cell[0], img_cell[1] = q8(img), plan.last_ok
            # Steady-overflow revert, mirroring Renderer.draw's fetch-free
            # stale-flag protocol: a steady capacity pinched by camera
            # cycling can enter a PERSISTENT overflow (truncated frames
            # feed threshold publication, which then can never drop
            # enough — measured deadlock at steady-frac 0.48,
            # scripts/r5_garden_diag.py); the bench must carry the same
            # safety the product API does.
            if plan.mode == "steady" and plan.frames % 8 == 0:
                pending = plan.take_overflow_acc()
                stale = ovf_pending[0]
                ovf_pending[0] = pending
                if stale is not None and bool(stale):
                    log("steady-overflow revert: back to the full set")
                    plan.mode = "full"
                    plan.steady_declined = False
                    ovf_pending[0] = None
            # stays a device scalar: run() fetches once at the end
            return dig(img, plan.last_count)

        return dispatch_fn

    def make_chained():
        """Chained per-pass dispatch for NON-capped big-scene modes
        (flat/xla blend A/Bs)."""
        from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
        from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
        from vk3dgaussiansplatting_tpu.ops import sort as sort_ops

        # Big operands ride as explicit jit ARGS — closure-captured device
        # arrays hung the remote compile helper on the 14M sort (2026-08-21).
        kg = jax.jit(
            lambda eps, t: keygen_ops.generate_sort_elements(
                t, vj.at[2, 3].add(eps), pj, cj, config, capacity
            )
        )
        so = jax.jit(lambda el: sort_ops.sort_elements(el, config))
        rg = jax.jit(lambda el: ranges_ops.find_ranges(el, config.num_tiles))
        bl = jax.jit(make_blend_fn(config, blend_mode))

        first = [True]

        def chained(eps):
            # First call: log after each pass's (slow, remote) compile so
            # the tpu_run stall detector sees liveness between compiles.
            t0 = time.time()
            el, fr = kg(eps, table)
            count_cell[0] = el.count
            if first[0]:
                log(f"  [compile] keygen done t+{time.time()-t0:.0f}s")
            el = so(el)
            if first[0]:
                log(f"  [compile] sort done t+{time.time()-t0:.0f}s")
            r = rg(el)
            if first[0]:
                log(f"  [compile] ranges done t+{time.time()-t0:.0f}s")
            img = bl(el, r, fr)
            out = dig(img, el.count)
            if first[0]:
                log(f"  [compile] blend+digest done t+{time.time()-t0:.0f}s")
                first[0] = False
            return out

        return chained

    # At garden scale the single-frame monolithic program breaks the remote
    # compile helper (transport broken pipe after ~25 min, observed 2026-08-20)
    # AND risks wedging the tunnel; big capped scenes use the production
    # ChainedTemporalPlan (pipeline.py — the same code Renderer.draw runs),
    # which also carries the depth-prefilter steady set.  SMALL scenes stay
    # on the monolithic frame program: the chained path's per-program
    # overheads dominate there (train7k measured 88.7 ms chained vs 49.8
    # monolithic, r4), matching Renderer.BIG_SCENE_CAPACITY.
    if capped_mode and on_tpu and big_scene:
        dispatch = [make_plan_dispatch()]
        log("chained per-pass dispatch via pipeline.ChainedTemporalPlan")
    elif big_scene:
        dispatch = [make_chained()]
        log("big scene: chained per-pass dispatch (monolithic frame program "
            "breaks the remote compiler at this scale)")
    else:
        dispatch = [frame_digest]

    def run(num_frames):
        d = None
        for i in range(num_frames):
            # PYTHON float: jnp.float32(i) is a DEVICE array in this jax,
            # and float()-ing it inside dispatch_fn blocked on the whole
            # queue every frame (+~28 ms/frame, r4 code review)
            d = dispatch[0](i * 1.0e-5)
        return float(d)

    t0 = time.time()
    try:
        run(1)
    except Exception as e:  # noqa: BLE001 — remote compile can die; fall back
        if big_scene or not on_tpu:
            raise
        log(f"monolithic frame compile failed ({type(e).__name__}); "
            f"falling back to chained per-pass dispatch")
        dispatch[0] = make_chained()
        run(1)
    log(f"compile+first frame in {time.time()-t0:.0f}s")
    if capped_mode:
        # Converge the temporal caps before timing (the production steady
        # state; escalation takes <= log2(cap_max/cap) frames, plus margin
        # headroom frames — mirrors the reference's 1000-frame warmup,
        # Renderer.cpp:477-487).
        for i in range(14):
            dispatch[0](i * 1.0e-5)
            if ok_cell[1] == 0:
                continue  # monolithic dispatch does not track ok/stats
            cur = int(ok_cell[0][-1])  # per-frame fetch: warmup only
            st = [int(v) for v in np.asarray(ok_cell[2])] if ok_cell[2] is not None else []
            log(f"  warmup frame {i}: ok={cur} "
                f"[n_invalid, fits, packed_end, n_grow, n_unfix]={st}")
        if ok_cell[1]:
            n_ok = sum(int(o) for o in ok_cell[0])
            log(f"caps warmup: ok {n_ok}/{ok_cell[1]} frames")
        else:
            log("caps warmup done (ok not tracked on monolithic dispatch)")

    if capped_mode and on_tpu:
        # Pre-warm the per-frame view-matrix device cache for every eps the
        # timed runs will use: a device_put mid-run round-trips the tunnel.
        for i in range(args.frames + 4):
            view_of(i * 1.0e-5)

    if capped_mode and prefilter_on and plan_cell[0] is not None:
        # Steady-state switch: the warmup converged the per-tile caps AND
        # published the depth thresholds; from here keygen drops
        # past-saturation gaussians, so the per-element passes re-compile
        # at a smaller static capacity.  Probe frames (inside
        # try_steady_switch; fetched, excluded from timing) confirm the
        # filtered live count actually fits.
        plan = plan_cell[0]
        log(f"steady switch: capacity {capacity/1e6:.2f}M -> "
            f"{plan.steady_capacity/1e6:.2f}M (frac {steady_frac})")
        t0 = time.time()
        if plan.try_steady_switch(table, view_of(2.0e-4), pj, cj):
            log(f"steady set active (compile+probe {time.time()-t0:.0f}s)")
    # Robust timing: the tunnel adds ±15% run-to-run noise to any single
    # timed block (r4: identical configs measured 237.9-299.4 while the
    # chained per-pass measurement held at ~208 across runs).  Time
    # several shorter blocks, each with its own one-frame baseline
    # subtraction, and report the MEDIAN block.
    n_blocks = max(1, args.frames // 12)
    block_frames = max(args.frames // n_blocks, 1)
    block_ms = []
    for _b in range(n_blocks):
        t0 = time.perf_counter()
        run(1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(block_frames + 1)
        tn = time.perf_counter() - t0
        block_ms.append((tn - t1) / block_frames * 1e3)
    ms_per_frame = float(np.median(block_ms))
    log("block ms/frame: " + str([round(b, 1) for b in block_ms])
        + f" -> median {ms_per_frame:.1f}")
    if plan_cell[0] is not None and getattr(
        plan_cell[0], "last_dispatch_ms", None
    ):
        # Host-side blocking diagnostics: async dispatch should cost ~0;
        # a per-program host time near the device pass time means the
        # dispatch SYNCS (the r4 bench-vs-chain gap investigation).
        disp = [[] for _ in range(4)]
        for i in range(6):
            # PYTHON float (a device scalar here re-introduces the per-frame
            # blocking float() the adjacent run() comment warns about, and
            # skews the very dispatch timings this loop measures)
            dispatch[0](i * 1.0e-5)
            for k, v in enumerate(plan_cell[0].last_dispatch_ms):
                disp[k].append(v)
        log("host dispatch ms [kg, sort, ranges, blend3] per frame: "
            + str([[round(x, 1) for x in d] for d in disp]))
    baseline = BASELINES_MS[scene]

    if capped_mode and ok_cell[1]:
        ok_n = int(jnp.sum(jnp.stack(
            [o.astype(jnp.int32) for o in ok_cell[0]]
        )))
        log(f"capped fast-path rate: {ok_n}/{ok_cell[1]} frames validated")
    result = {
        "metric": f"{scene}_ms_per_frame",
        "value": round(ms_per_frame, 3),
        "unit": "ms",
        "vs_baseline": round(baseline / ms_per_frame, 3),
    }

    if image_check:
        # One steady-state frame at eps=0, fetched and diffed against the
        # CPU XLA-tier reference render of the same camera: the insurance
        # that a TPU-only miscompile in any production kernel cannot hide
        # behind in-graph validation (VERDICT r4 #7).  Retries a few eps if
        # the frame happened to be degraded (ok=0).
        img_u8 = ok_f = None
        # SETTLE at the check view: the first frame after an eps jump can
        # legitimately flag not-ok (flipped tiles; a hot flipped tile past
        # the patch budget degrades the whole frame until the temporal
        # state adapts, ~1-2 frames).  The check certifies the steady-state
        # production frame of a static camera, so dispatch the SAME view
        # until ok (bounded retries).
        for i in range(6):
            dispatch[0](0.0)
            if img_cell[0] is None:
                break
            ok_f = bool(img_cell[1]) if img_cell[1] is not None else True
            if ok_f and i >= 1:
                break
        if img_cell[0] is not None:
            img_u8 = np.asarray(img_cell[0])
        if ref_proc is not None:
            t0 = time.time()
            try:
                rc = ref_proc.wait(timeout=2400)
            except Exception:
                ref_proc.kill()
                rc = -1
                log("image-check: CPU reference TIMED OUT (killed)")
            log(f"image-check: CPU reference finished rc={rc} "
                f"(+{time.time()-t0:.0f}s wait)")
        import os as _os
        import subprocess

        # ---- Part 1 (tight): blend/transport certification on IDENTICAL
        # inputs.  Fetch the check frame's sorted elements + frame data
        # from the TPU and blend them through the CPU f64 reference tier:
        # measured agreement on same data is max |d| = 2, mean 0.16
        # (scripts/r5_crossdata_check.py), so the bar can be razor-tight —
        # this is what caught-the-blue-channel-class bugs trip.
        cross_ok = None
        el_d = rg_d = fr_d = None
        if plan_cell[0] is not None:
            # Fused steady path keeps only the kg outputs during timing;
            # rebuild the sorted elements + ranges bit-identically here.
            plan_cell[0].materialize_intermediates()
        if plan_cell[0] is not None and plan_cell[0].last_elements is not None:
            el_d = plan_cell[0].last_elements
            rg_d = plan_cell[0].last_ranges
            fr_d = plan_cell[0].last_frame
        elif img_u8 is not None:
            # Monolithic (small-scene) path: elements don't depend on the
            # temporal caps, so a per-pass recompute at the check view is
            # bit-identical to the checked frame's inputs.
            from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
            from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
            from vk3dgaussiansplatting_tpu.ops import sort as sort_ops

            kg2 = jax.jit(
                lambda t, v: keygen_ops.generate_sort_elements(
                    t, v, pj, cj, config, capacity
                )
            )
            el_d, fr_d = kg2(table, view_of(0.0))
            el_d = jax.jit(lambda e: sort_ops.sort_elements(e, config))(el_d)
            rg_d = jax.jit(
                lambda e: ranges_ops.find_ranges(e, config.num_tiles)
            )(el_d)
        if img_u8 is not None and el_d is not None:
            xd_path = _os.path.expanduser(f"~/.cache/vk3dgs_xd_{scene}.npz")
            t0 = time.time()
            np.savez(
                xd_path,
                tile=np.asarray(el_d.tile), depth=np.asarray(el_d.depth),
                index=np.asarray(el_d.index), count=np.asarray(el_d.count),
                ranges=np.asarray(rg_d),
                screen_pos=np.asarray(fr_d.screen_pos),
                color_alpha=np.asarray(fr_d.color_alpha),
                cov_inv=np.asarray(fr_d.cov_inv),
                img_u8=img_u8,
            )
            log(f"image-check: fetched check-frame arrays in "
                f"{time.time()-t0:.0f}s -> {xd_path}")
            cmd = [sys.executable, "-u", __file__, "--cpu",
                   "--scene", scene, "--crossdata", xd_path]
            t0 = time.time()
            try:
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=1800
                )
                verdict = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception as exc:  # noqa: BLE001
                log(f"image-check: crossdata subprocess failed: {exc}")
                verdict = None
            if verdict is not None:
                try:
                    cross_ok = bool(
                        verdict["mean"] <= 0.75 and verdict["max"] <= 8
                    )
                except (KeyError, TypeError) as exc:
                    log(f"image-check: malformed crossdata verdict: {exc}")
                    verdict, cross_ok = None, None
                log(f"image-check crossdata (blend certification, "
                    f"+{time.time()-t0:.0f}s): {verdict} -> "
                    f"{'OK' if cross_ok else 'FAIL'}")
                result["image_check_blend"] = verdict

        # ---- Part 2 (loose): keygen sanity vs the independently-computed
        # CPU reference (same scene, CPU keygen).  The residual here is the
        # cross-platform transcendental drift in per-gaussian frame data
        # (exp/rsqrt/div in projection + SH), measured mean |d| 1.7 at
        # train7k and 5.5 at garden — a keygen MISCOMPILE shows up as the
        # 13-57-mean class.  docs/TOLERANCES.md transcendental-parity
        # caveat; verified blend-independent by r5_crossdata_check.
        drift_ok = None
        ref_u8 = None
        if img_u8 is not None and ref_path and _os.path.exists(ref_path):
            try:
                ref_u8 = np.load(ref_path)
            except Exception as exc:  # noqa: BLE001 — truncated cache file
                log(f"image-check: unreadable reference {ref_path}: {exc}")
                try:
                    _os.remove(ref_path)
                except OSError:
                    pass
        if ref_u8 is not None:
            d = np.abs(
                img_u8[..., :3].astype(np.int32)
                - ref_u8[..., :3].astype(np.int32)
            )
            frac_gt16 = float((d > 16).any(axis=-1).mean())
            drift_ok = bool(d.mean() <= 9.0 and frac_gt16 <= 0.3)
            log(f"image-check keygen-drift (cross-platform): mean |d| "
                f"{d.mean():.3f}, |d|>16 {frac_gt16:.4f}, max "
                f"{int(d.max())} -> {'OK' if drift_ok else 'FAIL'}")
            result["image_check_drift"] = {
                "mean": round(float(d.mean()), 3),
                "frac_gt16": round(frac_gt16, 4),
                "max": int(d.max()),
            }
        if cross_ok is None and drift_ok is None:
            log("image_ok: SKIPPED (no reference or no image)")
            result["image_ok"] = None
        else:
            image_ok = bool(
                (cross_ok is not False) and (drift_ok is not False)
            )
            log(f"image_ok: {image_ok} (blend={cross_ok} drift={drift_ok} "
                f"frame ok={ok_f})")
            result["image_ok"] = image_ok
            if not image_ok and img_u8 is not None:
                try:
                    from vk3dgaussiansplatting_tpu.io.image import write_png

                    _os.makedirs("artifacts", exist_ok=True)
                    write_png(f"artifacts/imgcheck_{scene}_tpu.png", img_u8)
                    if ref_path and _os.path.exists(ref_path):
                        write_png(
                            f"artifacts/imgcheck_{scene}_ref.png",
                            np.load(ref_path),
                        )
                    log(f"image-check: dumped artifacts/imgcheck_{scene}_*")
                except Exception as exc:  # noqa: BLE001
                    log(f"image-check dump failed: {exc}")
    return result


def crossdata_main(args):
    """CPU crossdata mode (--crossdata): blend TPU-fetched element/frame
    arrays through the f64 reference tier and print a JSON diff verdict
    vs the npz's own TPU image (blend/transport certification on
    identical inputs)."""
    from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
    from vk3dgaussiansplatting_tpu.ops.keygen import (
        GaussianFrameData,
        SortElements,
    )

    jax.config.update("jax_enable_x64", True)
    z = np.load(args.crossdata)
    config = build_config(args, args.scene, "xla")
    el = SortElements(
        tile=jnp.asarray(z["tile"]), depth=jnp.asarray(z["depth"]),
        index=jnp.asarray(z["index"]), count=jnp.asarray(z["count"]),
    )
    fr = GaussianFrameData(
        color_alpha=jnp.asarray(z["color_alpha"]),
        cov2d=jnp.zeros_like(jnp.asarray(z["cov_inv"])),
        cov_inv=jnp.asarray(z["cov_inv"]),
        screen_pos=jnp.asarray(z["screen_pos"]),
    )
    img = _blend_strips_chunked(el, jnp.asarray(z["ranges"]), fr, config)
    u8 = np.asarray(
        blend_ops.quantize_image(jnp.asarray(img).astype(jnp.float32))
    )
    d = np.abs(
        u8[..., :3].astype(np.int32) - z["img_u8"][..., :3].astype(np.int32)
    )
    print(json.dumps({
        "mean": round(float(d.mean()), 4),
        "max": int(d.max()),
        "frac_gt1": round(float((d > 1).any(-1).mean()), 6),
    }), flush=True)


def _blend_strips_chunked(elements, ranges, frame_data, config):
    """Full-image reference blend in tile-row strips (CPU reference tier).

    blend_tiles_xla materializes O(E x 256) — ~40+ GB at garden capacity —
    so the reference render slices the SORTED element list per strip of
    tile rows (elements are tile-contiguous after the sort).  Per-element
    alpha/eligibility are computed in f32 with exactly the XLA tier's
    formulas, but the TRANSMITTANCE ACCUMULATION runs in float64: the
    f32 global-cumsum-then-rebase of the XLA tier cancels catastrophically
    at garden scale (log-term magnitudes ~1e5 -> per-tile logT error up to
    ~0.06 -> mean |d| ~5.5 u8 steps vs the TPU render, r5 garden
    diagnosis) — a reference must be numerically STRONGER than the tier it
    certifies, not weaker.  Caller (ref_frame_main) enables jax x64."""
    from vk3dgaussiansplatting_tpu.core.config import SENTINEL
    from vk3dgaussiansplatting_tpu.ops import blend as blend_ops

    rows_per_strip = 1
    gw, gh = config.grid_width, config.grid_height
    t_total = config.num_tiles
    tiles_per = rows_per_strip * gw
    ts = config.tile_size
    p = ts * ts

    r_host = np.asarray(ranges).astype(np.int64)
    tile_h = np.asarray(elements.tile)
    idx_h = np.asarray(elements.index)

    # distinct pad buckets -> distinct compiles; pow2 buckets keep it few
    def bucket(n):
        b = 1 << 14
        while b < n:
            b *= 2
        return b

    def strip64(tile, gid, rg, sp, ca, ci, t0t):
        e = tile.shape[0]
        live = tile != jnp.uint32(SENTINEL)
        tile_i = jnp.where(live, tile, 0).astype(jnp.int32)
        tile_loc = tile_i - t0t
        in_strip = live & (tile_loc >= 0) & (tile_loc < tiles_per)
        tile_loc_c = jnp.clip(tile_loc, 0, tiles_per - 1)
        tile_x = tile_i % gw
        tile_y = tile_i // gw
        gidx = gid.astype(jnp.int32)
        screen_pos = sp[gidx]
        color_alpha = ca[gidx]
        cov_inv = ci[gidx]
        lu, lv = blend_ops._pixel_coords(config)
        tsf = jnp.float32(ts)
        u = tile_x[:, None].astype(jnp.float32) * tsf + lu[None, :]
        v = tile_y[:, None].astype(jnp.float32) * tsf + lv[None, :]
        gx = screen_pos[:, 0:1]
        gy = screen_pos[:, 1:2]
        # Pre-scaled coefficients + the PALLAS kernel's exact f32 op order
        # (blend_kernel._blend_flat_kernel): f32 mul/add are IEEE on both
        # backends, so f is BIT-IDENTICAL to the production tier and the
        # f <= 0 eligibility knife-edge cannot flip vs it (the class that
        # produced isolated |d| up to ~37 px against the XLA-tier-order f).
        a = cov_inv[:, 0:1] * jnp.float32(-0.5)
        b = cov_inv[:, 1:2] * jnp.float32(-1.0)
        c = cov_inv[:, 2:3] * jnp.float32(-0.5)
        galpha = color_alpha[:, 3:4]
        dx = gx - u
        dy = v - gy
        f = (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = galpha * jnp.exp(f)
        eligible = (
            (f <= jnp.float32(0.0))
            & (alpha >= jnp.float32(config.alpha_cutoff))
            & live[:, None]
        )
        in_range = (
            jnp.arange(e, dtype=jnp.uint32)[:, None]
            < rg[tile_i, 1][:, None]
        )
        # f64 transmittance accumulation
        alpha64 = alpha.astype(jnp.float64)
        log_term = jnp.where(
            eligible & in_range,
            jnp.maximum(jnp.log1p(-alpha64), jnp.float64(blend_ops.LOG_T_MIN)),
            jnp.float64(0.0),
        )
        cs_excl = jnp.cumsum(log_term, axis=0) - log_term
        seg_start = rg[tile_i, 0].astype(jnp.int32)
        log_t_excl = cs_excl - cs_excl[seg_start]
        t_excl = jnp.exp(log_t_excl)
        not_done = t_excl >= jnp.float64(config.transmittance_stop)
        w = jnp.where(
            eligible & not_done & in_range & in_strip[:, None],
            t_excl * alpha64,
            jnp.float64(0.0),
        )
        contrib = w[:, :, None] * color_alpha[:, None, :3].astype(jnp.float64)
        tile_tgt = jnp.where(in_strip, tile_loc_c, tiles_per)
        colors = jnp.zeros((tiles_per + 1, p, 3), jnp.float64).at[
            tile_tgt
        ].add(contrib, mode="drop")[:tiles_per]
        return colors.astype(jnp.float32)

    colors_out = np.zeros((t_total, p, 3), np.float32)
    if True:
        strip_jit = jax.jit(strip64)
        for s in range(-(-gh // rows_per_strip)):
            t0t = s * tiles_per
            t1t = min(t0t + tiles_per, t_total)
            seg = r_host[t0t:t1t]
            ne = seg[:, 1] > seg[:, 0]
            if not ne.any():
                continue
            e0 = int(seg[ne, 0].min())
            e1 = int(seg[ne, 1].max())
            n = e1 - e0
            pad = bucket(n)
            tiles = np.full(pad, SENTINEL, np.uint32)
            tiles[:n] = tile_h[e0:e1]
            gids = np.zeros(pad, np.uint32)
            gids[:n] = idx_h[e0:e1]
            rg = jnp.asarray(np.clip(r_host - e0, 0, pad).astype(np.uint32))
            colors = np.asarray(
                strip_jit(
                    jnp.asarray(tiles), jnp.asarray(gids), rg,
                    frame_data.screen_pos, frame_data.color_alpha,
                    frame_data.cov_inv, jnp.int32(t0t),
                )
            )
            colors_out[t0t:t1t] = colors[: t1t - t0t]
    return np.asarray(
        blend_ops.assemble_tile_colors(jnp.asarray(colors_out), config)
    )


def ref_frame_main(args):
    """CPU reference-frame mode (--ref-frame-out): render ONE full
    (uncapped) frame of --scene at the benchmark camera perturbed by
    --ref-eps on the CPU XLA tier, and save the quantized u8 image."""
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops

    scene = args.scene
    # f64 is needed for the reference blend's transmittance accumulation
    # (_blend_strips_chunked rationale).  Enabling the flag globally does
    # NOT perturb keygen/sort: every production dtype is explicit, and the
    # full element/frame digest was verified identical with and without
    # the flag (r5).
    jax.config.update("jax_enable_x64", True)
    n_gauss, width, height, _t = SCENES[scene]
    config = build_config(args, scene, "xla")  # uncapped reference
    capacity = config.sort_capacity(n_gauss)
    host_table, cam, mult, _live = build_scene(args, scene, config, capacity)
    table = jax.device_put(
        GaussianTable(
            position=jnp.asarray(host_table.position),
            scale=jnp.asarray(host_table.scale * np.float32(mult)),
            rot=jnp.asarray(host_table.rot),
            sh=jnp.asarray(host_table.sh),
            opacity=jnp.asarray(host_table.opacity),
        )
    )
    del host_table
    view, proj = cam.matrices()
    v = np.array(view, dtype=np.float32)
    v[2, 3] += np.float32(args.ref_eps)
    t0 = time.time()
    elements, frame_data = jax.jit(
        lambda t, vv, pp, cc: keygen_ops.generate_sort_elements(
            t, vv, pp, cc, config, capacity
        )
    )(table, jnp.asarray(v), jnp.asarray(proj),
      jnp.asarray(cam.position, dtype=jnp.float32))
    elements = jax.jit(
        lambda el: sort_ops.sort_elements(el, config)
    )(elements)
    ranges = jax.jit(
        lambda el: ranges_ops.find_ranges(el, config.num_tiles)
    )(elements)
    log(f"ref-frame: keygen+sort+ranges in {time.time()-t0:.0f}s "
        f"({int(elements.count)/1e6:.2f}M elements)")
    t0 = time.time()
    img = _blend_strips_chunked(elements, ranges, frame_data, config)
    u8 = np.asarray(blend_ops.quantize_image(jnp.asarray(img)))
    log(f"ref-frame: strip blend in {time.time()-t0:.0f}s")
    import os as _os

    d = _os.path.dirname(args.ref_frame_out)
    if d:
        _os.makedirs(d, exist_ok=True)
    # ATOMIC write: a killed/timed-out subprocess must not leave a
    # truncated cache file that poisons every later run (r5 review).
    tmp = args.ref_frame_out + ".tmp.npy"
    np.save(tmp, u8)
    _os.replace(tmp, args.ref_frame_out)
    log(f"ref-frame: saved {args.ref_frame_out}")


if __name__ == "__main__":
    main()
