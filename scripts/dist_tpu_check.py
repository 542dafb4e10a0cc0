"""Distributed pipeline on REAL TPU hardware, 1-device mesh.

Proves the full shard_map graph — sharded keygen, depth-band thresholds,
all_to_all routing, per-device sort, systolic strip blend with the PALLAS
carry-aware tier — traces, compiles server-side, and executes on hardware
(the CPU-mesh tests cannot vouch for Mosaic-under-shard_map, CLAUDE.md).
Asserts image parity against a plain single-device render.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, ".")


def main():
    import math

    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.parallel import dist
    from vk3dgaussiansplatting_tpu.parallel.mesh import make_mesh
    from vk3dgaussiansplatting_tpu.pipeline import Renderer
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_cloud_table

    print("device:", jax.devices()[0], flush=True)
    ndev = len(jax.devices())
    config = RenderConfig(
        width=256,
        height=256,
        capacity_slack_per_tile=64,
        sort_algorithm=SortAlgorithm.XLA_SORT,
    )
    table = procedural_cloud_table(
        60_000, seed=9, extent=3.0, scale_log_mean=-3.0
    )
    cam = Camera(config.aspect)
    cam.set_position((0.0, 0.0, 3.0))
    cam.set_rotation(math.pi, 0.0)
    view, proj = cam.matrices()

    mesh = make_mesh(ndev)
    padded = dist._pad_table(table, ndev)
    plan = dist.plan_distribution(config, padded.num_gaussians, ndev)
    for pallas in (False, True):
        fn = dist.make_distributed_render(
            mesh, config, plan, use_pallas_blend=pallas
        )
        img, dropped = fn(
            jax.tree.map(jnp.asarray, padded),
            jnp.asarray(view),
            jnp.asarray(proj),
            jnp.asarray(cam.position, dtype=jnp.float32),
        )
        img = np.asarray(img)[: config.height, : config.width]
        dropped = int(np.sum(np.asarray(dropped)))
        print(
            f"dist(pallas={pallas}) image: finite={np.isfinite(img).all()} "
            f"lit={(img.sum(-1) > 0).sum()} dropped={dropped}",
            flush=True,
        )
        assert dropped == 0, f"strip-window overflow dropped {dropped}"
        if pallas:
            img_pallas = img
        else:
            img_xla = img

    # Like-for-like parity: each distributed tier against its own
    # single-device formulation (cross-tier deltas compound the two
    # documented float tolerances, docs/TOLERANCES.md).
    deltas = {}
    for pallas, img in ((False, img_xla), (True, img_pallas)):
        renderer = Renderer(config, use_pallas_blend=pallas)
        renderer.init_for_scene(table)
        ref = np.asarray(renderer.draw(cam).image)
        deltas[pallas] = np.abs(img - ref).max()
    print(f"max |delta| vs matching single-device tier: "
          f"xla {deltas[False]:.2e}, pallas {deltas[True]:.2e}", flush=True)
    assert deltas[False] <= 2e-3 and deltas[True] <= 2e-3, (
        "distributed parity violated"
    )

    # ndev=1 distributed-overhead factor on the real chip: the honest
    # lower bound for multi-chip projections (VERDICT r3 weak #6) — the
    # distributed graph's extra passes (banding, all_to_all with slab
    # padding, per-phase strip slicing, carry blend) vs the plain
    # pipeline, with zero actual communication.
    import time as _time

    def timeit(f, *args, iters=6):
        d = None
        for _ in range(1):
            d = f(*args)
        jax.block_until_ready(d)
        np.asarray(jax.tree.leaves(d)[0])  # observe completion (tunnel)
        t0 = _time.perf_counter()
        d = f(*args)
        np.asarray(jax.tree.leaves(d)[0])
        t1 = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        for _ in range(iters + 1):
            d = f(*args)
        np.asarray(jax.tree.leaves(d)[0])
        tn = _time.perf_counter() - t0
        return (tn - t1) / iters

    fn_d = dist.make_distributed_render(
        mesh, config, plan, use_pallas_blend=True
    )
    targs = (
        jax.tree.map(jnp.asarray, padded),
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(cam.position, dtype=jnp.float32),
    )
    t_dist = timeit(lambda *a: fn_d(*a)[0], *targs)
    renderer = Renderer(config, use_pallas_blend=True)
    renderer.init_for_scene(table)
    t_plain = timeit(lambda c: renderer.draw(c).image, cam)
    print(
        f"ndev=1 overhead: dist {t_dist*1e3:.1f} ms vs plain "
        f"{t_plain*1e3:.1f} ms -> factor {t_dist/max(t_plain,1e-9):.2f}",
        flush=True,
    )
    print("dist TPU check OK", flush=True)


if __name__ == "__main__":
    main()
