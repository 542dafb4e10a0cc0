"""Per-pass TPU timing at benchmark scale — the perf iteration tool.

Times each pipeline pass (keygen / sort / ranges / blend) with the in-jit
fori-loop protocol on a calibrated procedural scene.  Mirrors the reference's
RECORD_GPU_TIMES per-pass breakdown (Renderer.cpp:458-510).

Usage: scripts/tpu_run.sh /tmp/pass_bench.txt 1800 400 2 -- \\
           python -u scripts/pass_bench.py --scene train7k_720p
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def bench(name, make_digest, *xargs, iters=8):
    """Chained-dispatch timing: dispatch `iters+1` runs back-to-back (async,
    serialized on the core) and fetch one scalar; subtract the 1-run time.

    (An in-jit `lax.fori_loop` over the pass was the original protocol, but
    fori-wrapped big programs hang the remote compile helper at garden scale
    — observed twice on 2026-08-20; per-run dispatch compiles the plain pass
    program and measures the same thing.  Big operands are passed as
    EXPLICIT jit arguments, never closures: closure-captured device arrays
    are embedded as HLO constants and hang the remote compile helper —
    observed on the 14M sort, 2026-08-21.)
    """
    f = jax.jit(make_digest)

    def run(n):
        d = None
        for i in range(n):
            d = f(jnp.float32(i) * jnp.float32(1e-6), *xargs)
        return float(d)

    t0 = time.perf_counter()
    run(1)
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters + 1)
    tn = time.perf_counter() - t0
    dt = (tn - t1) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from bench import SCENES, calibrate_scale
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_cloud_table,
        procedural_surface_table,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="train7k_720p", choices=SCENES)
    ap.add_argument("--skip-sort", action="store_true")
    ap.add_argument("--skip-blend", action="store_true")
    ap.add_argument("--mult", type=float, default=None,
                    help="skip calibration; use this scale multiplier")
    ap.add_argument("--sat-diag", action="store_true",
                    help="saturation-truncation diagnostic: per-cap valid-tile "
                         "fraction + element reduction (drives the capped-"
                         "gather design)")
    ap.add_argument("--bk", type=int, default=None,
                    help="blend_batch_k override (A/B the blend batch width)")
    ap.add_argument("--cap", type=int, default=0,
                    help="also time the capped blend path at this cap")
    ap.add_argument("--scene-gen", default="cloud",
                    choices=["cloud", "surface"])
    ap.add_argument("--steady", action="store_true",
                    help="steady-regime per-pass breakdown: converge the "
                         "caps+thresholds, then time keygen(filtered)/sort/"
                         "ranges/capped phases at --steady-frac of the "
                         "full capacity (what bench.py's timed frames run)")
    ap.add_argument("--steady-frac", type=float, default=0.62)
    ap.add_argument("--prefilter-diag", action="store_true",
                    help="temporal depth-prefilter diagnostic: converge the "
                         "caps+thresholds, then report kept gaussian/element "
                         "fractions under the published threshold map "
                         "(drives --steady-frac)")
    ap.add_argument("--keygen-diag", action="store_true",
                    help="sub-time the expansion kernel on the real cull "
                         "pattern (keygen cost split)")
    args = ap.parse_args()

    import math

    n_gauss, width, height, target = SCENES[args.scene]
    kw = {}
    if args.bk is not None:
        kw["blend_batch_k"] = args.bk
    if args.cap:
        kw["blend_depth_cap"] = args.cap
    config = RenderConfig(width=width, height=height, sort_algorithm=SortAlgorithm.XLA_SORT,
                          capacity_pow_two=False, **kw)
    capacity = config.sort_capacity(n_gauss)
    print(f"{args.scene}: n={n_gauss} capacity={capacity} tiles={config.num_tiles}", flush=True)

    if args.scene_gen == "surface":
        host = procedural_surface_table(n_gauss, seed=42)
    else:
        host = procedural_cloud_table(n_gauss, seed=42)
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    if args.mult is not None:
        mult = args.mult
        print(f"using fixed scale x{mult:.3f}", flush=True)
    else:
        mult, live = calibrate_scale(host, cam, config, capacity, target)
        print(f"calibrated x{mult:.3f} -> {live/1e6:.2f}M elements", flush=True)

    table = jax.device_put(
        GaussianTable(
            position=jnp.asarray(host.position),
            scale=jnp.asarray(host.scale * np.float32(mult)),
            rot=jnp.asarray(host.rot),
            sh=jnp.asarray(host.sh),
            opacity=jnp.asarray(host.opacity),
        )
    )
    del host
    view, proj = cam.matrices()
    vj, pj, cj = jnp.asarray(view), jnp.asarray(proj), jnp.asarray(cam.position)

    def keygen_digest(s, table):
        el, fr = keygen_ops.generate_sort_elements(
            table, vj.at[2, 3].add(s), pj, cj, config, capacity
        )
        return jnp.sum(el.depth[:8].astype(jnp.float32)) + el.count.astype(jnp.float32)

    bench("keygen", keygen_digest, table)

    if args.keygen_diag:
        # Where does keygen go: expansion kernel on the REAL cull pattern
        # vs everything else (projection, SH, cumsum, window probes).
        from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel
        from vk3dgaussiansplatting_tpu.render import project

        @jax.jit
        def real_counts(table):
            pos_view = project.view_transform(table.position, vj)
            ndc = project.ndc_position(pos_view, pj)
            visible = keygen_ops.cull_mask(pos_view, ndc, config)
            cov2d = project.compute_cov2d(
                table.scale, table.rot, pos_view, vj, config
            )
            sp = project.screen_space_position(pos_view, pj, config)
            ext = project.tile_extents(sp, cov2d, config)
            w = ext[:, 2] - ext[:, 0]
            h = ext[:, 3] - ext[:, 1]
            return jnp.where(visible, w * h, 0).astype(jnp.int32)

        counts_r = jax.block_until_ready(real_counts(table))
        n = counts_r.shape[0]

        def expand_digest(s, counts):
            # columns as in-graph iotas (closure-captured device arrays hang
            # the remote compile helper, CLAUDE.md)
            c0 = jnp.arange(n, dtype=jnp.int32) + s.astype(jnp.int32)
            cols6 = [c0] + [jnp.arange(n, dtype=jnp.int32)] * 5
            cols, total = expand_kernel.expand_rows(cols6, counts, capacity)
            return jnp.sum(cols[0][:8].astype(jnp.float32)) + total.astype(
                jnp.float32
            )

        bench("  sub: expansion (real counts)", expand_digest, counts_r,
              iters=6)
        # (projection-only cost reads off as keygen - expansion.)

        # span statistics: what the crossbar-skip sees on this pattern
        cnp = np.cumsum(np.asarray(counts_r))
        total_r = int(cnp[-1])
        nw = -(-capacity // 512)
        j0 = np.arange(nw + 1) * 512
        j0e = np.clip(j0, 0, max(total_r - 1, 0))
        sw_raw = np.searchsorted(cnp, j0e + 1, side="left")
        sw = (sw_raw[:-1] // 128) * 128
        span = sw_raw[1:] - sw + 1
        livew = j0[:-1] < total_r
        nsrc = np.clip(-(-span // 128), 1, 4)[livew]
        refill = (span[livew] > 512).mean()
        hist = [(nsrc == k).mean() for k in (1, 2, 3, 4)]
        print(
            f"  span stats (live windows): nsrc 1/2/3/4 = "
            f"{hist[0]:.2f}/{hist[1]:.2f}/{hist[2]:.2f}/{hist[3]:.2f}, "
            f"refill frac = {refill:.3f}, mean span = "
            f"{span[livew].mean():.0f}",
            flush=True,
        )

    elements, frame = jax.jit(
        lambda t: keygen_ops.generate_sort_elements(t, vj, pj, cj, config, capacity)
    )(table)
    jax.block_until_ready(elements)

    if not args.skip_sort:
        def sort_digest(s, el0):
            el = keygen_ops.SortElements(
                tile=el0.tile,
                depth=el0.depth + s.astype(jnp.uint32),
                index=el0.index,
                count=el0.count,
            )
            se = sort_ops.sort_elements_xla(el, num_tiles=config.num_tiles)
            return jnp.sum(se.index[:8].astype(jnp.float32))

        bench("sort(xla)", sort_digest, elements, iters=3)

    sorted_elems = jax.jit(
        lambda el: sort_ops.sort_elements_xla(el, num_tiles=config.num_tiles)
    )(elements)
    jax.block_until_ready(sorted_elems)

    def ranges_digest(s, se):
        el = keygen_ops.SortElements(
            tile=se.tile,
            depth=se.depth,
            index=se.index + s.astype(jnp.uint32),
            count=se.count,
        )
        rg = ranges_ops.find_ranges(el, config.num_tiles)
        return jnp.sum(rg[:8, :].astype(jnp.float32))

    bench("find_ranges", ranges_digest, sorted_elems)

    ranges = jax.jit(
        lambda se: ranges_ops.find_ranges(se, config.num_tiles)
    )(sorted_elems)
    jax.block_until_ready(ranges)

    def gather_digest(s, se, fr):
        fr2 = keygen_ops.GaussianFrameData(
            color_alpha=fr.color_alpha + s,
            cov2d=fr.cov2d,
            cov_inv=fr.cov_inv,
            screen_pos=fr.screen_pos,
        )
        feat = blend_kernel._build_features(se, fr2)
        return jnp.sum(feat[:, :8])

    bench("feature gather+pack", gather_digest, sorted_elems, frame)

    if args.sat_diag:
        # For each cap C: a tile is EXACT under truncation at C iff its
        # range fits (r <= C) or every pixel's transmittance is below the
        # stop threshold at the cap (T monotone).  Reports the valid-tile
        # fraction and the element-gather reduction sum(min(r, C))/sum(r).
        r = (ranges[:, 1] - ranges[:, 0]).astype(jnp.int32)
        for cap_v in (256, 512, 1024, 2048):
            @jax.jit
            def diag(se, rg, fr, cap=cap_v):
                rr = (rg[:, 1] - rg[:, 0]).astype(jnp.int32)
                _, t_out = blend_kernel.blend_tiles_pallas_flat(
                    se, rg, fr, config, cap=cap, with_t=True
                )
                tmax = jnp.max(t_out, axis=1)
                valid = (rr <= cap) | (tmax < jnp.float32(config.transmittance_stop))
                kept = jnp.sum(jnp.minimum(rr, cap))
                return jnp.mean(valid.astype(jnp.float32)), kept

            t0 = time.time()
            vfrac, kept = diag(sorted_elems, ranges, frame)
            vfrac, kept = float(vfrac), int(kept)
            tot = int(jnp.sum(r))
            print(
                f"sat-diag cap={cap_v}: valid_tiles={vfrac*100:.2f}% "
                f"elements kept={kept/1e6:.2f}M/{tot/1e6:.2f}M "
                f"({100*kept/max(tot,1):.1f}%)  [{time.time()-t0:.0f}s]",
                flush=True,
            )

    if args.steady:
        import dataclasses as _dc

        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops

        cfg_t = (
            config
            if config.blend_depth_cap > 0
            else _dc.replace(config, blend_depth_cap=384)
        )
        conv = jax.jit(
            lambda se, rg, fr, st: capped_ops.blend_tiles_capped_temporal(
                se, rg, fr, cfg_t, st
            )
        )
        state = capped_ops.init_caps_state(cfg_t)
        for it in range(10):
            _img, state, ok = conv(sorted_elems, ranges, frame, state)
        nf = int(jnp.sum((state.thr != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)))
        print(f"steady: thresholds converged, finite={nf}/{cfg_t.num_tiles}",
              flush=True)
        cap_s = -(-int(capacity * args.steady_frac) // 512) * 512
        thr_d = jax.block_until_ready(state.thr)

        def kg_f_digest(s, table, thr):
            el, fr = keygen_ops.generate_sort_elements(
                table, vj.at[2, 3].add(s), pj, cj, cfg_t, cap_s,
                depth_thr=thr,
            )
            return jnp.sum(el.depth[:8].astype(jnp.float32)) + el.count.astype(
                jnp.float32
            )

        bench(f"steady keygen(filtered)@{cap_s/1e6:.2f}M", kg_f_digest,
              table, thr_d)

        el_s, fr_s = jax.block_until_ready(jax.jit(
            lambda t, thr: keygen_ops.generate_sort_elements(
                t, vj, pj, cj, cfg_t, cap_s, depth_thr=thr
            )
        )(table, thr_d))
        print(f"  steady live = {int(el_s.count)/1e6:.2f}M", flush=True)

        def sort_s_digest(s, el0):
            el = keygen_ops.SortElements(
                tile=el0.tile, depth=el0.depth + s.astype(jnp.uint32),
                index=el0.index, count=el0.count,
            )
            se = sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
            return jnp.sum(se.index[:8].astype(jnp.float32))

        bench(f"steady sort@{cap_s/1e6:.2f}M", sort_s_digest, el_s, iters=4)

        se_s = jax.block_until_ready(jax.jit(
            lambda el: sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
        )(el_s))

        def rg_s_digest(s, se):
            el = keygen_ops.SortElements(
                tile=se.tile, depth=se.depth,
                index=se.index + s.astype(jnp.uint32), count=se.count,
            )
            rg = ranges_ops.find_ranges(el, cfg_t.num_tiles)
            return jnp.sum(rg[:8, :].astype(jnp.float32))

        bench("steady find_ranges", rg_s_digest, se_s)
        rg_s = jax.block_until_ready(jax.jit(
            lambda se: ranges_ops.find_ranges(se, cfg_t.num_tiles)
        )(se_s))

        def split_digest(s, se, rg, fr, st):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d, cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            img, st2, ok, stats = capped_ops.blend_tiles_capped_split(
                se, rg, fr2, cfg_t, st
            )
            return jnp.sum(img[::97, ::97, 0]) + ok.astype(jnp.float32)

        bench("steady capped split (all 3 phases)", split_digest,
              se_s, rg_s, fr_s, state, iters=4)

        # Full steady frame as production dispatches it (keygen + ONE
        # fused rest program, pipeline.ChainedTemporalPlan fuse_steady).
        # This number exceeds the per-pass sum by the keygen frame-data
        # work the el-only digest DCEs (+~6 ms) plus the finish phase's
        # live policy update (+~3 ms) — see docs/PERFORMANCE.md
        # "chain-fusion closure" + "keygen true-cost attribution".
        kg_j = jax.jit(
            lambda s, t, thr: keygen_ops.generate_sort_elements(
                t, vj.at[2, 3].add(s), pj, cj, cfg_t, cap_s, depth_thr=thr
            )
        )
        st_cell = [state]

        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops2

        # PRODUCTION grouping (pipeline.ChainedTemporalPlan fuse_steady):
        # keygen + ONE fused rest program.  Per-pass dispatch measures
        # ~4 ms slower (scripts/r5_chain_fuse.py A vs C); keep the digest
        # + state live so nothing is DCE'd.
        def fused_rest(el, fr2, st):
            se = sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
            rg2 = ranges_ops.find_ranges(se, cfg_t.num_tiles)
            img, st2, ok, stats = capped_ops2.blend_tiles_capped_split(
                se, rg2, fr2, cfg_t, st
            )
            d = (
                jnp.sum(img[::97, ::97, 0])
                + el.count.astype(jnp.float32) * jnp.float32(1e-9)
                + ok.astype(jnp.float32) * jnp.float32(1e-9)
            )
            return d, st2

        fused_j = jax.jit(fused_rest)

        def chain_once(s):
            el, fr2 = kg_j(s, table, st_cell[0].thr)
            d, st_cell[0] = fused_j(el, fr2, st_cell[0])
            return d

        def chain_run(k, step):
            d = None
            for i in range(k):
                d = chain_once(jnp.float32(i) * jnp.float32(step))
            return float(d)

        t0 = time.perf_counter()
        chain_run(1, 1e-6)
        print(f"  [steady chain] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        for label, step in (("static", 1e-6), ("MOTION", 1e-5)):
            t0 = time.perf_counter()
            chain_run(1, step)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain_run(7, step)
            tn = time.perf_counter() - t0
            print(f"steady FULL CHAIN {label}: {(tn-t1)/6*1e3:.2f} ms/frame",
                  flush=True)

    if args.prefilter_diag:
        # Converge caps+thresholds on the pinned camera, then measure how
        # much of the scene the published threshold map would drop at
        # keygen — the number that sizes bench.py's --steady-frac.
        import dataclasses as _dc

        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
        from vk3dgaussiansplatting_tpu.ops import prefilter
        from vk3dgaussiansplatting_tpu.render import project as prj

        cfg_t = (
            config
            if config.blend_depth_cap > 0
            else _dc.replace(config, blend_depth_cap=384)
        )
        conv = jax.jit(
            lambda se, rg, fr, st: capped_ops.blend_tiles_capped_temporal(
                se, rg, fr, cfg_t, st
            )
        )
        state = capped_ops.init_caps_state(cfg_t)
        for it in range(10):
            t0 = time.time()
            _img, state, ok = conv(sorted_elems, ranges, frame, state)
            nf = int(
                jnp.sum(
                    (state.thr != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
                )
            )
            print(
                f"  pf converge it={it} ok={bool(ok)} "
                f"finite_thr={nf}/{cfg_t.num_tiles} "
                f"caps_mean={float(jnp.mean(state.caps.astype(jnp.float32))):.0f} "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )

        @jax.jit
        def keepstats(tb, thr):
            pos_view = prj.view_transform(tb.position, vj)
            ndc = prj.ndc_position(pos_view, pj)
            visible = keygen_ops.cull_mask(pos_view, ndc, cfg_t)
            cov2d = prj.compute_cov2d(tb.scale, tb.rot, pos_view, vj, cfg_t)
            sp = prj.screen_space_position(pos_view, pj, cfg_t)
            ext = prj.tile_extents(sp, cov2d, cfg_t)
            depth = prj.depth_key(pos_view[:, 2], cfg_t)
            dil = prefilter.dilate_thresholds(thr, cfg_t)
            keep = prefilter.gaussian_keep_mask(sp, ext, depth, dil, cfg_t)
            w = ext[:, 2] - ext[:, 0]
            h = ext[:, 3] - ext[:, 1]
            c_full = jnp.where(visible, w * h, 0)
            c_keep = jnp.where(visible & keep, w * h, 0)
            return (
                jnp.sum(visible.astype(jnp.int32)),
                jnp.sum((visible & keep).astype(jnp.int32)),
                jnp.sum(c_full),
                jnp.sum(c_keep),
            )

        nv, nk, ef, ek = [int(x) for x in keepstats(table, state.thr)]
        print(
            f"prefilter-diag: gaussians kept {nk}/{nv} "
            f"({100*nk/max(nv,1):.1f}%), elements kept "
            f"{ek/1e6:.2f}M/{ef/1e6:.2f}M ({100*ek/max(ef,1):.1f}%)",
            flush=True,
        )

    if args.cap:
        from vk3dgaussiansplatting_tpu.ops import capped as capped_ops

        # Temporal policy steady state: converge the per-tile caps first
        # (escalation frames), then time the validated fast path with the
        # converged caps as input (what the benchmark's warm frames run).
        conv = jax.jit(
            lambda se, rg, fr, c: capped_ops.blend_tiles_capped_temporal(
                se, rg, fr, config, c
            )
        )
        caps = capped_ops.init_caps(config)
        for it in range(6):
            t0 = time.time()
            _img, caps, ok = conv(sorted_elems, ranges, frame, caps)
            ok = bool(ok)
            print(f"  caps converge it={it} ok={ok} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
            if ok:
                break
        ep = capped_ops.packed_capacity_temporal(config, capacity)
        print(f"  packed capacity={ep/1e6:.2f}M slots", flush=True)

        def capped_digest(s, se, rg, fr, c):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d,
                cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            img, _caps2, ok = capped_ops.blend_tiles_capped_temporal(
                se, rg, fr2, config, c
            )
            return jnp.sum(img[::97, ::97, 0]) + ok.astype(jnp.float32)

        # is the timed digest on the fast path? (fractional part = ok flag)
        d0 = float(jax.jit(capped_digest)(
            jnp.float32(1e-6), sorted_elems, ranges, frame, caps))
        print(f"  timed-digest ok flag present: {d0}", flush=True)

        bench(f"capped temporal blend+gather (cap={args.cap})", capped_digest,
              sorted_elems, ranges, frame, caps, iters=4)

        # Sub-piece breakdown: where does the capped path's time go?
        from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk
        from vk3dgaussiansplatting_tpu.ops.pallas.compact_kernel import (
            compact_runs,
        )

        ep = capped_ops.packed_capacity_temporal(config, capacity)
        wmax = -(-config.blend_cap_max // 128) * 128 + 128

        @jax.jit
        def layout(se, rg, c):
            starts = rg[:, 0].astype(jnp.int32)
            r = rg[:, 1].astype(jnp.int32) - starts
            counts = jnp.minimum(r, c)
            off = starts - (starts // 128) * 128
            slabw = -(-(off + counts) // 128) * 128
            pcum = jnp.cumsum(slabw)
            sbase = (pcum - slabw).astype(jnp.int32)
            return starts, sbase, counts, off

        starts_d, sbase_d, counts_d, off_d = jax.block_until_ready(
            layout(sorted_elems, ranges, caps)
        )

        def compact_digest(s, idx, st, sb):
            out = compact_runs(idx + s.astype(jnp.uint32), st, sb, ep, wmax)
            return jnp.sum(out[:8].astype(jnp.float32))

        bench("  sub: compact_runs", compact_digest, sorted_elems.index,
              starts_d, sbase_d, iters=4)

        gid_d = jax.block_until_ready(
            jax.jit(lambda idx, st, sb: compact_runs(idx, st, sb, ep, wmax))(
                sorted_elems.index, starts_d, sbase_d
            )
        )

        def gather_digest2(s, fr, gid):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d,
                cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            g = jnp.where(gid == jnp.uint32(0xFFFFFFFF), 0, gid).astype(jnp.int32)
            rows = jnp.take(bk.pack_feature_table(fr2), g, axis=0, mode="clip")
            feat = bk.features_from_rows(rows, None, config.blend_batch_k)
            return jnp.sum(feat[:, :8])

        bench("  sub: gather+pack (ep rows)", gather_digest2, frame, gid_d,
              iters=4)

        @jax.jit
        def featbuild(fr, gid):
            g = jnp.where(gid == jnp.uint32(0xFFFFFFFF), 0, gid).astype(jnp.int32)
            rows = jnp.take(bk.pack_feature_table(fr), g, axis=0, mode="clip")
            return bk.features_from_rows(rows, None, config.blend_batch_k)

        feat_d = jax.block_until_ready(featbuild(frame, gid_d))
        pranges_d = jax.block_until_ready(
            jax.jit(
                lambda sb, off, cnt: jnp.stack(
                    [sb + off, sb + off + cnt], axis=1
                ).astype(jnp.uint32)
            )(sbase_d, off_d, counts_d)
        )

        def blendcore_digest(s, feat, pr):
            img, t = bk.blend_flat_core(
                feat + s * jnp.float32(1e-9), pr, config, ep, with_t=True
            )
            return jnp.sum(img[::97, ::97, 0]) + jnp.sum(t[::97, ::97])

        bench("  sub: blend_flat_core (ep)", blendcore_digest, feat_d,
              pranges_d, iters=4)

        # blend batch-width sweep (cumprod is log2(bk) multiplies/batch;
        # smaller bk trades fewer lanes per multiply against more batches)
        import dataclasses as _dc

        for bkv in (256, 768, 1024):
            cfg_v = _dc.replace(config, blend_batch_k=bkv)

            @jax.jit
            def featbuild_v(fr, gid, bkv=bkv):
                g = jnp.where(
                    gid == jnp.uint32(0xFFFFFFFF), 0, gid
                ).astype(jnp.int32)
                rows = jnp.take(
                    bk.pack_feature_table(fr), g, axis=0, mode="clip"
                )
                return bk.features_from_rows(rows, None, bkv)

            feat_v = jax.block_until_ready(featbuild_v(frame, gid_d))

            def bc_digest(s, feat, pr, cfg_v=cfg_v):
                img, t = bk.blend_flat_core(
                    feat + s * jnp.float32(1e-9), pr, cfg_v, ep, with_t=True
                )
                return jnp.sum(img[::97, ::97, 0]) + jnp.sum(t[::97, ::97])

            bench(f"  sub: blend_flat_core bk={bkv}", bc_digest, feat_v,
                  pranges_d, iters=4)
            del feat_v

        # isolation matrix for the gather anomaly (real 141 ms vs 66 ms
        # probe at identical shapes): values vs in-graph table build
        n_table = int(frame.color_alpha.shape[0])
        rng_g = np.random.default_rng(5)
        rtable = jnp.asarray(
            rng_g.normal(size=(n_table, 10)).astype(np.float32)
        )
        ridx = jnp.asarray(
            rng_g.integers(0, n_table, ep).astype(np.int32)
        )

        def ga_digest(s, rtable, gid):
            g = jnp.where(gid == jnp.uint32(0xFFFFFFFF), 0, gid).astype(
                jnp.int32
            )
            rows = jnp.take(rtable + s, g, axis=0, mode="clip")
            return jnp.sum(rows[:8, :])

        bench("  sub: gather REAL gids, random table", ga_digest, rtable,
              gid_d, iters=4)

        def gb_digest(s, fr, ridx):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d,
                cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            rows = jnp.take(
                bk.pack_feature_table(fr2), ridx, axis=0, mode="clip"
            )
            return jnp.sum(rows[:8, :])

        bench("  sub: gather random idx, in-graph table", gb_digest, frame,
              ridx, iters=4)

        def gc_digest(s, rtable, gid):
            g = jnp.where(gid == jnp.uint32(0xFFFFFFFF), 0, gid).astype(
                jnp.int32
            )
            rows = jnp.take(rtable, g, axis=0, mode="clip")
            return jnp.sum(rows[:8, :]) + s * 0

        bench("  sub: gather REAL gids (in-graph mask), PARAM table",
              gc_digest, rtable, gid_d, iters=4)

        def gf_digest(s, rtable, ridx):
            rows = jnp.take(rtable, ridx, axis=0, mode="clip")
            return jnp.sum(rows[:8, :]) + s * 0

        bench("  sub: gather PARAM idx, PARAM table (probe repro)",
              gf_digest, rtable, ridx, iters=4)

        gid_i32 = jax.block_until_ready(
            jax.jit(
                lambda gid: jnp.where(
                    gid == jnp.uint32(0xFFFFFFFF), 0, gid
                ).astype(jnp.int32)
            )(gid_d)
        )
        bench("  sub: gather PARAM real-gid i32, PARAM table",
              gf_digest, rtable, gid_i32, iters=4)

        def gp_digest(s, rtable, ridx):
            rows = rtable.at[ridx].get(mode="promise_in_bounds")
            return jnp.sum(rows[:8, :]) + s * 0

        bench("  sub: gather promise_in_bounds", gp_digest, rtable, ridx,
              iters=4)

        rtable8 = jax.block_until_ready(
            jax.jit(lambda t: t[:, :8])(rtable)
        )

        def g8_digest(s, t8, ridx):
            rows = jnp.take(t8, ridx, axis=0, mode="clip")
            return jnp.sum(rows[:8, :]) + s * 0

        bench("  sub: gather [N,8] table", g8_digest, rtable8, ridx, iters=4)

        rtable4 = jax.block_until_ready(
            jax.jit(lambda t: t[:, :4] + 0.0)(rtable)
        )

        def g4_digest(s, t4, ridx):
            rows = jnp.take(t4, ridx, axis=0, mode="clip")
            return jnp.sum(rows[:8, :]) + s * 0

        bench("  sub: gather [N,4] table", g4_digest, rtable4, ridx, iters=4)

        def nocond_digest(s, se, rg, fr, c):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d,
                cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            img, _t, valid, fits, _pc, _cnt = capped_ops._capped_core(
                se, rg, fr2, config, c, ep
            )
            return (
                jnp.sum(img[::97, ::97, 0])
                + jnp.sum(valid.astype(jnp.float32))
                + fits.astype(jnp.float32)
            )

        bench("  sub: capped core (no fallback cond)", nocond_digest,
              sorted_elems, ranges, frame, caps, iters=4)

    if not args.skip_blend:
        def blend_digest(s, se, rg, fr):
            fr2 = keygen_ops.GaussianFrameData(
                color_alpha=fr.color_alpha + s,
                cov2d=fr.cov2d,
                cov_inv=fr.cov_inv,
                screen_pos=fr.screen_pos,
            )
            img = blend_kernel.blend_tiles_pallas_flat(se, rg, fr2, config)
            return jnp.sum(img[::97, ::97, 0])

        bench("blend(pallas) incl gather", blend_digest,
              sorted_elems, ranges, frame, iters=4)


if __name__ == "__main__":
    main()
