"""Multi-device scaling-efficiency benchmark (LIVE sorted-elements/s).

The north-star asks for >=80% sort-elements/s scaling efficiency to 4 hosts
(BASELINE.md).  Real multi-chip hardware is not available in this
environment, so this harness runs the distributed pipeline on the XLA
host-platform virtual mesh (functional scaling validation + collective byte
accounting) and on real multi-chip meshes when present.

Metric: live sorted elements per second — the per-frame sum over devices of
elements actually received, sorted and blended (`SortElements.count` after
the exchange), NOT capacity slots.  Efficiency at N devices = rate_N /
(N * rate_1).  Also prints the per-frame collective traffic each device
sends, derived from the static exchange shapes:

  * all_gather of blend frame data: (ndev-1)/ndev * N_gauss * 48 B received
    per device (color_alpha 16 + cov2d 12 + cov_inv 12 + screen_pos 8);
  * all_to_all element exchange: 3 u32 columns * ndev*slab slots sent.

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

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize force-registers axon and overrides the env var;
        # re-assert CPU after import (CLAUDE.md TPU-environment note).
        jax.config.update("jax_platforms", "cpu")
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

    base_rate = None
    for ndev in args.devices:
        if ndev > len(jax.devices()):
            print(f"skip ndev={ndev}: only {len(jax.devices())} devices")
            continue
        config = RenderConfig(
            width=args.width,
            height=args.height,
            capacity_slack_per_tile=256,
            sort_algorithm=SortAlgorithm.XLA_SORT,
        )
        if config.grid_height % ndev:
            print(f"skip ndev={ndev}: grid_height {config.grid_height} not divisible")
            continue
        mesh = make_mesh(ndev)
        padded = dist._pad_table(table, ndev)
        plan = dist.plan_distribution(config, padded.num_gaussians, ndev)
        fn = dist.make_distributed_render(mesh, config, plan, return_stats=True)
        targs = (
            jax.tree.map(jnp.asarray, padded),
            jnp.asarray(view),
            jnp.asarray(proj),
            jnp.asarray(cam.position, dtype=jnp.float32),
        )
        img, acct = jax.block_until_ready(fn(*targs))  # compile
        acct_np = np.asarray(acct).reshape(-1, 4)
        # [live_local, sent_live, recv_live, dropped] per device
        live = acct_np[:, 2] - acct_np[:, 3]
        live_total = int(live.sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            img, acct = fn(*targs)
        np.asarray(acct)  # force completion
        dt = (time.perf_counter() - t0) / args.iters

        rate = live_total / dt
        if base_rate is None:
            base_rate, base_ndev, base_dt, base_live = rate, ndev, dt, live_total
        # On a virtual (host-platform) mesh all "devices" time-slice one CPU,
        # so rate_N/(N*rate_1) trends to 1/N for a perfect implementation.
        # Report the honest quantity per backend: real meshes get scaling
        # efficiency; virtual meshes get WORK CONSERVATION t_1/t_N (1.0 =
        # the distributed graph adds no redundant work).
        virtual = jax.devices()[0].platform == "cpu"
        if virtual:
            eff_label = f"work-conservation {base_dt/dt*100:.0f}%"
        else:
            eff = rate / (base_rate * ndev / base_ndev)
            eff_label = f"efficiency {eff*100:.0f}%"
        dropped = base_live - live_total if live_total < base_live else 0

        # Measured exchange accounting: sent_live x per-element bytes
        # (12 B keys+id + 36 B routed features; no frame-data all_gather
        # on the routed path) vs the static slab capacity.
        sent_live = int(acct_np[:, 1].sum())
        # 3 u32 key/id columns (+9 routed f32 feature columns when the
        # render was built with route_features, the default here)
        cols_b = (3 + 9) * 4
        a2a_static = cols_b * ndev * plan.slab_capacity
        a2a_live = cols_b * sent_live / max(ndev, 1)
        slab_drop = int((acct_np[:, 0] - acct_np[:, 1]).sum())
        strip_drop = int(acct_np[:, 3].sum())
        print(
            f"ndev={ndev}: {dt*1e3:.1f} ms/frame, live={live_total/1e6:.2f}M "
            f"({live.tolist()} per dev), dropped={dropped}, "
            f"{rate/1e6:.2f} M live-elem/s, {eff_label}, "
            f"a2a/dev: live {a2a_live/1e6:.1f} MB of "
            f"{a2a_static/1e6:.1f} MB static "
            f"(slab_drop={slab_drop}, strip_drop={strip_drop})",
            flush=True,
        )
        assert dropped == 0, (
            f"ndev={ndev} dropped {dropped} elements — grow slab/capacity"
        )


if __name__ == "__main__":
    main()
