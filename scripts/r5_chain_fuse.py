"""Steady-chain program-grouping A/B — is the ~14 ms chain tail
program-boundary overhead?

The final frac-0.51 ledger (artifacts/pass_bench_r5_final_frac51.txt) sums
per-pass to ~177.6 ms while the chained frame measures 191.9: a ~14 ms tail
larger than the whole sort pass.  Two hypotheses:

  1. Per-program dispatch/launch overhead across the 7 program boundaries
     (kg | sort | ranges | layout | gather | finish | digest) — consistent
     with the r4 small-scene observation that per-program overheads dominate
     train7k (chained 88.7 vs monolithic 62-66 ms).
  2. The split-phase gather penalty that forced the 3-program split in r4
     ("in-graph gather operands 2x slower than parameters", ops/capped.py
     split-phase rationale) may be GONE on the r5 server stack: pass_bench's
     own `split_digest` jits all three phases as ONE fused program and
     measures ~116 ms — the same as the sum of its parts.

This probe times the full steady frame chain (state carried, digest live)
under four groupings on identical converged temporal state:

  A: kg | sort | ranges | layout | gather | finish+digest   (production-ish)
  B: kg | sort+ranges | layout+gather+finish+digest         (3 programs)
  C: kg | sort+ranges+layout+gather+finish+digest           (2 programs)
  D: kg+sort+ranges+layout+gather+finish+digest             (1 monolith;
     LAST — the r2-era monolith broke the remote compile helper, so any
     hang leaves A-C results already printed)

Usage: scripts/tpu_run.sh /tmp/chain_fuse.txt 3600 900 2 -- \
         python -u scripts/r5_chain_fuse.py --scene garden30k_1080p \
         --mult 0.451 --steady-frac 0.51
"""

import argparse
import dataclasses
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def main():
    from bench import SCENES
    from vk3dgaussiansplatting_tpu.core.config import (
        RenderConfig,
        SortAlgorithm,
    )
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
    from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_cloud_table,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="garden30k_1080p", choices=SCENES)
    ap.add_argument("--mult", type=float, default=0.451)
    ap.add_argument("--steady-frac", type=float, default=0.51)
    ap.add_argument("--skip-mono", action="store_true")
    args = ap.parse_args()

    n_gauss, width, height, _target = SCENES[args.scene]
    config = RenderConfig(
        width=width,
        height=height,
        sort_algorithm=SortAlgorithm.XLA_SORT,
        capacity_pow_two=False,
    )
    capacity = config.sort_capacity(n_gauss)
    print(
        f"{args.scene}: n={n_gauss} capacity={capacity} "
        f"tiles={config.num_tiles}",
        flush=True,
    )

    host = procedural_cloud_table(n_gauss, seed=42)
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    mult = args.mult
    print(f"using fixed scale x{mult:.3f}", flush=True)

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

    cfg_t = (
        config
        if config.blend_depth_cap > 0
        else dataclasses.replace(config, blend_depth_cap=384)
    )

    # Converge the temporal caps + prefilter thresholds exactly as
    # pass_bench --steady does (monolithic temporal program, 10 frames).
    conv = jax.jit(
        lambda se, rg, fr, st: capped_ops.blend_tiles_capped_temporal(
            se, rg, fr, cfg_t, st
        )
    )
    kg_full = jax.jit(
        lambda t: keygen_ops.generate_sort_elements(
            t, vj, pj, cj, cfg_t, capacity
        )
    )
    so_full = jax.jit(
        lambda el: sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
    )
    rg_full = jax.jit(lambda el: ranges_ops.find_ranges(el, cfg_t.num_tiles))
    t0 = time.time()
    el0, fr0 = kg_full(table)
    se0 = so_full(el0)
    rg0 = rg_full(se0)
    state = capped_ops.init_caps_state(cfg_t)
    for _ in range(10):
        _img, state, _ok = conv(se0, rg0, fr0, state)
    nf = int(
        jnp.sum((state.thr != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32))
    )
    print(
        f"converged finite={nf}/{cfg_t.num_tiles} [{time.time()-t0:.0f}s]",
        flush=True,
    )
    cap_s = -(-int(capacity * args.steady_frac) // 512) * 512
    print(f"steady capacity = {cap_s} ({cap_s/1e6:.2f}M)", flush=True)

    # --- shared sub-programs -------------------------------------------
    kg_j = jax.jit(
        lambda s, t, thr: keygen_ops.generate_sort_elements(
            t, vj.at[2, 3].add(s), pj, cj, cfg_t, cap_s, depth_thr=thr
        )
    )
    so_j = jax.jit(
        lambda el: sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
    )
    rg_j = jax.jit(lambda el: ranges_ops.find_ranges(el, cfg_t.num_tiles))
    dig_j = jax.jit(
        lambda img, c: jnp.sum(img[::97, ::97, 0])
        + c.astype(jnp.float32) * jnp.float32(1e-9)
    )

    def split_dig(el, rg2, fr2, st):
        img, st2, ok, _stats = capped_ops.blend_tiles_capped_split(
            el, rg2, fr2, cfg_t, st
        )
        d = (
            jnp.sum(img[::97, ::97, 0])
            + el.count.astype(jnp.float32) * jnp.float32(1e-9)
            + ok.astype(jnp.float32) * jnp.float32(1e-9)
        )
        return d, st2

    sr_j = jax.jit(lambda el: (lambda se: (se, rg_j(se)))(so_j(el)))
    sp_j = jax.jit(split_dig)
    sc_j = jax.jit(
        lambda el, fr2, st: (lambda se: split_dig(se, rg_j(se), fr2, st))(
            so_j(el)
        )
    )
    mono_j = jax.jit(
        lambda s, t, thr, st: (
            lambda el_fr: (
                lambda se: split_dig(se, rg_j(se), el_fr[1], st)
            )(so_j(el_fr[0]))
        )(kg_j(s, t, thr))
    )

    thr0 = jax.block_until_ready(state.thr)

    def run_variant(name, chain_once, iters=7):
        st_cell = [state]

        def chain_run(k, step):
            d = None
            for i in range(k):
                d, st_cell[0] = chain_once(
                    jnp.float32(i) * jnp.float32(step), st_cell[0]
                )
            return float(d)

        t0 = time.perf_counter()
        chain_run(1, 1e-6)
        print(
            f"  [{name}] compile+first {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        for label, step in (("static", 1e-6), ("MOTION", 1e-5)):
            st_cell[0] = state
            t0 = time.perf_counter()
            chain_run(1, step)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain_run(iters + 1, step)
            tn = time.perf_counter() - t0
            print(
                f"{name} {label}: {(tn-t1)/iters*1e3:.2f} ms/frame",
                flush=True,
            )

    # A: production grouping (6 programs + digest).
    def chain_a(s, st):
        el, fr2 = kg_j(s, table, st.thr)
        el = so_j(el)
        rg2 = rg_j(el)
        img, st2, ok, _stats = capped_ops.blend_tiles_capped_split(
            el, rg2, fr2, cfg_t, st
        )
        return dig_j(img, el.count), st2

    # B: 3 programs — kg | sort+ranges | split3+digest fused.
    def chain_b(s, st):
        el, fr2 = kg_j(s, table, st.thr)
        se, rg2 = sr_j(el)
        return sp_j(se, rg2, fr2, st)

    # C: 2 programs — kg | everything-after fused.
    def chain_c(s, st):
        el, fr2 = kg_j(s, table, st.thr)
        return sc_j(el, fr2, st)

    run_variant("A (production 7-program)", chain_a)
    run_variant("B (3-program)", chain_b)
    run_variant("C (2-program)", chain_c)
    if not args.skip_mono:
        run_variant(
            "D (1-program monolith)",
            lambda s, st: mono_j(s, table, st.thr, st),
        )


if __name__ == "__main__":
    main()
