"""Keygen true-cost attribution — where do the DCE'd ~13 ms go?

The chain-fusion closure (docs/PERFORMANCE.md) showed the per-pass keygen
digest (el-only) lets XLA delete the GaussianFrameData outputs, hiding
~13 ms of per-frame work that the chained frame pays.  This probe times
keygen under digests of increasing liveness at steady shapes:

  1. el-only                  (the ledger's 43.9 ms)
  2. el + screen/cov_inv      (frame geometry live, SH color still dead)
  3. el + full fr             (the true chained cost)
  4. el + full fr, channel-major SH table [N,3,16] passed pre-transposed
     (A/B: does the [N,16]x[N,16,3] einsum's broadcast layout matter?)

Usage: scripts/tpu_run.sh /tmp/kg_split.txt 2400 600 2 -- \
         python -u scripts/r5_kg_split.py
"""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def bench(name, make_digest, *xargs, iters=8):
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
    from vk3dgaussiansplatting_tpu.render import project
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_cloud_table,
    )
    import dataclasses

    scene = "garden30k_1080p"
    n_gauss, width, height, _ = SCENES[scene]
    config = RenderConfig(
        width=width, height=height, sort_algorithm=SortAlgorithm.XLA_SORT,
        capacity_pow_two=False,
    )
    capacity = config.sort_capacity(n_gauss)
    cfg_t = (
        config
        if config.blend_depth_cap > 0
        else dataclasses.replace(config, blend_depth_cap=384)
    )
    host = procedural_cloud_table(n_gauss, seed=42)
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    mult = 0.451
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
    view, proj_m = cam.matrices()
    vj, pj, cj = (
        jnp.asarray(view), jnp.asarray(proj_m), jnp.asarray(cam.position)
    )

    # Converge thresholds (cached programs from the bench runs).
    conv = jax.jit(
        lambda se, rg, fr, st: capped_ops.blend_tiles_capped_temporal(
            se, rg, fr, cfg_t, st
        )
    )
    el0, fr0 = jax.jit(
        lambda t: keygen_ops.generate_sort_elements(
            t, vj, pj, cj, cfg_t, capacity
        )
    )(table)
    se0 = jax.jit(
        lambda el: sort_ops.sort_elements_xla(el, num_tiles=cfg_t.num_tiles)
    )(el0)
    rg0 = jax.jit(lambda el: ranges_ops.find_ranges(el, cfg_t.num_tiles))(se0)
    state = capped_ops.init_caps_state(cfg_t)
    for _ in range(10):
        _img, state, _ok = conv(se0, rg0, fr0, state)
    cap_s = -(-int(capacity * 0.51) // 512) * 512
    thr_d = jax.block_until_ready(state.thr)
    print(f"steady capacity {cap_s} ({cap_s/1e6:.2f}M)", flush=True)

    def kg(s, t, thr):
        return keygen_ops.generate_sort_elements(
            t, vj.at[2, 3].add(s), pj, cj, cfg_t, cap_s, depth_thr=thr
        )

    def dig_el(el):
        return (
            jnp.sum(el.depth[:8].astype(jnp.float32))
            + el.count.astype(jnp.float32)
        )

    bench("kg el-only (ledger)", lambda s, t, thr: dig_el(kg(s, t, thr)[0]),
          table, thr_d)

    def d2(s, t, thr):
        el, fr = kg(s, t, thr)
        return (
            dig_el(el)
            + jnp.sum(fr.screen_pos[::65536, :])
            + jnp.sum(fr.cov_inv[::65536, :])
        )

    bench("kg el+geom (SH dead)", d2, table, thr_d)

    def d3(s, t, thr):
        el, fr = kg(s, t, thr)
        return (
            dig_el(el)
            + jnp.sum(fr.screen_pos[::65536, :])
            + jnp.sum(fr.cov_inv[::65536, :])
            + jnp.sum(fr.color_alpha[::65536, :])
            + jnp.sum(fr.cov2d[::65536, :])
        )

    bench("kg FULL fr (true chain cost)", d3, table, thr_d)

    # 4: SH einsum in isolation, current layout vs channel-major table.
    sh = table.sh  # [N,16,3]
    # Host-side transpose so the channel-major table is genuinely laid out
    # [N,3,16] in HBM (a device-side jnp.transpose output's layout is the
    # compiler's choice).
    sh_cm = jax.device_put(
        np.ascontiguousarray(np.transpose(np.asarray(sh), (0, 2, 1)))
    )  # [N,3,16]
    pos = table.position

    def sh_cur(s, pos, sh):
        d = project.normalize_dirs(pos - (cj + s)[None, :])
        basis = project.sh_basis16(d)
        rgb = jnp.einsum("nc,ncr->nr", basis, sh)
        return jnp.sum(rgb[::65536, :])

    def sh_chan(s, pos, sh_cm):
        d = project.normalize_dirs(pos - (cj + s)[None, :])
        basis = project.sh_basis16(d)
        rgb = jnp.sum(basis[:, None, :] * sh_cm, axis=2)  # [N,3]
        return jnp.sum(rgb[::65536, :])

    bench("SH einsum (current [N,16,3])", sh_cur, pos, sh)
    bench("SH channel-major [N,3,16]", sh_chan, pos, sh_cm)


if __name__ == "__main__":
    main()
