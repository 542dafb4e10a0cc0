"""Multi-device scaling-efficiency benchmark (sort-elements/s at 1..N devices).

The north-star asks for >=80% sort-elements/s scaling efficiency to 4 hosts
(BASELINE.md).  Real multi-chip hardware is not available in this environment,
so this harness runs the distributed pipeline on the XLA host-platform
virtual mesh (functional scaling validation + collective-count accounting)
and on real multi-chip meshes when present.  Reports elements/s per device
count and efficiency vs the single-device rate.

Usage (CPU mesh): JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python scripts/scaling_bench.py --devices 1 2 4 8
"""

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--gaussians", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.parallel import dist
    from vk3dgaussiansplatting_tpu.parallel.mesh import make_mesh
    from vk3dgaussiansplatting_tpu.render.camera import Camera
    from vk3dgaussiansplatting_tpu.scenes.synthetic import procedural_cloud_table

    table = procedural_cloud_table(args.gaussians, seed=42)
    cam = Camera(args.width / args.height)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(math.pi, 0.0)
    view, proj = cam.matrices()

    results = {}
    for ndev in args.devices:
        if ndev > len(jax.devices()):
            print(f"skip ndev={ndev}: only {len(jax.devices())} devices")
            continue
        config = RenderConfig(
            width=args.width,
            height=args.height,
            capacity_slack_per_tile=64,
            sort_algorithm=SortAlgorithm.XLA_SORT,
        )
        if config.grid_height % ndev:
            print(f"skip ndev={ndev}: grid_height {config.grid_height} not divisible")
            continue
        mesh = make_mesh(ndev)
        padded = dist._pad_table(table, ndev)
        plan = dist.plan_distribution(config, padded.num_gaussians, ndev)
        fn = dist.make_distributed_render(mesh, config, plan)
        targs = (
            jax.tree.map(jnp.asarray, padded),
            jnp.asarray(view),
            jnp.asarray(proj),
            jnp.asarray(cam.position, dtype=jnp.float32),
        )
        img = jax.block_until_ready(fn(*targs))  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            img = fn(*targs)
        np.asarray(img[:1, :1])  # force completion
        dt = (time.perf_counter() - t0) / args.iters
        elements = plan.local_capacity * ndev
        rate = elements / dt
        results[ndev] = rate
        base = results.get(args.devices[0], rate)
        eff = rate / (base * ndev / args.devices[0])
        print(
            f"ndev={ndev}: {dt*1e3:.1f} ms/frame, {rate/1e6:.1f} M elem-slots/s, "
            f"efficiency {eff*100:.0f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
