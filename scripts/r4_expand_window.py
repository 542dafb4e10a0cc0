"""Expansion window-size sweep on the REAL garden cull pattern.

r4_expand_split showed the expansion kernel is per-window overhead bound
(DMA issue + grid loop): compare-count and crossbars are both free at
WINDOW=512.  If that holds on the real cull pattern, enlarging the window
shrinks the kernel linearly.  This probe times WINDOW in {512, 1024, 2048}
(with NBLOCKS re-derived and fresh jits) on counts produced by the actual
projection/culling of the calibrated garden scene, plus the
stage-knockout variants at 512 to confirm the real pattern is also
overhead-bound.

Usage: scripts/tpu_run.sh /tmp/expand_window.txt 3000 600 2 -- \
           python -u scripts/r4_expand_window.py
"""

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")

from vk3dgaussiansplatting_tpu.ops.pallas import expand_kernel as ek  # noqa

CAP = 14_190_624


def bench_expand(name, counts_j, n, iters=6):
    inner = ek.expand_rows.__wrapped__  # undecorated: globals re-read

    @functools.partial(jax.jit, static_argnames=("capacity",))
    def expand(cols, ct, capacity):
        return inner(cols, ct, capacity)

    def digest(s, ct):
        c0 = jnp.arange(n, dtype=jnp.int32) + s.astype(jnp.int32)
        cols6 = [c0] + [jnp.arange(n, dtype=jnp.int32)] * 5
        cols, total = expand(cols6, ct, CAP)
        return jnp.sum(cols[0][:8].astype(jnp.float32)) + total.astype(
            jnp.float32
        )

    f = jax.jit(digest)

    def run(k):
        d = None
        for i in range(k):
            d = f(jnp.float32(i), counts_j)
        return float(d)

    t0 = time.perf_counter()
    run(1)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(iters + 1)
    tn = time.perf_counter() - t0
    print(f"{name}: {(tn-t1)/iters*1e3:.2f} ms (first {c:.1f}s)", flush=True)


def set_window(w):
    ek.WINDOW = w
    ek.NBLOCKS = w // ek.GROUP


def main():
    # real cull pattern: run the count pipeline on the calibrated scene
    from bench import SCENES
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig
    from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
    from vk3dgaussiansplatting_tpu.ops import keygen as keygen_ops
    from vk3dgaussiansplatting_tpu.render import project as prj
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_cloud_table,
    )

    n_gauss, width, height, _ = SCENES["garden30k_1080p"]
    config = RenderConfig(width=width, height=height, capacity_pow_two=False)
    host = procedural_cloud_table(n_gauss, seed=42)
    cam = Camera(width / height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    view, proj = cam.matrices()
    vj, pj = jnp.asarray(view), jnp.asarray(proj)
    table = jax.device_put(
        GaussianTable(
            position=jnp.asarray(host.position),
            scale=jnp.asarray(host.scale * np.float32(0.451)),
            rot=jnp.asarray(host.rot),
            sh=jnp.asarray(host.sh),
            opacity=jnp.asarray(host.opacity),
        )
    )
    del host

    @jax.jit
    def real_counts(tb):
        pos_view = prj.view_transform(tb.position, vj)
        ndc = prj.ndc_position(pos_view, pj)
        visible = keygen_ops.cull_mask(pos_view, ndc, config)
        cov2d = prj.compute_cov2d(tb.scale, tb.rot, pos_view, vj, config)
        sp = prj.screen_space_position(pos_view, pj, config)
        ext = prj.tile_extents(sp, cov2d, config)
        w = ext[:, 2] - ext[:, 0]
        h = ext[:, 3] - ext[:, 1]
        return jnp.where(visible, w * h, 0).astype(jnp.int32)

    counts_j = jax.block_until_ready(real_counts(table))
    total = int(jnp.sum(counts_j))
    print(f"real counts: total={total/1e6:.2f}M of n={n_gauss}", flush=True)

    bench_expand("W=512 real (baseline)", counts_j, n_gauss)

    real_count_fn = ek._count_blocked
    real_gather_fn = ek._gather_groups

    def fake_gather(vals_buf, local, found, nsrc):
        base = jnp.broadcast_to(local, (ek.NUM_ROWS, ek.WINDOW))
        return base + jnp.broadcast_to(
            found.astype(jnp.int32), (ek.NUM_ROWS, ek.WINDOW)
        ) + vals_buf[:, :1] * 0

    def fake_count(vbuf, j_eff, nsrc):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ek.WINDOW), 1)
        covered = nsrc * jnp.int32(ek.GROUP)
        return jnp.minimum(lane // 2, covered - 1) + vbuf[:1, :1] * 0

    ek._count_blocked = fake_count
    ek._gather_groups = fake_gather
    bench_expand("W=512 real, neither stage", counts_j, n_gauss)
    ek._count_blocked = real_count_fn
    ek._gather_groups = real_gather_fn

    for w in (1024, 2048):
        set_window(w)
        bench_expand(f"W={w} real", counts_j, n_gauss)
        ek._count_blocked = fake_count
        ek._gather_groups = fake_gather
        bench_expand(f"W={w} real, neither stage", counts_j, n_gauss)
        ek._count_blocked = real_count_fn
        ek._gather_groups = real_gather_fn
    set_window(512)


if __name__ == "__main__":
    main()
