"""Generate the committed real-format .ply fixture (tests/fixtures/).

Reproduces the on-disk layout of an INRIA-3DGS training export — the format
GardenScene.cpp:15 loads through hapPLY (ResourceManager.cpp:167-300):
binary_little_endian, property order
    x y z nx ny nz f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3
with pre-activation value distributions (log scales, opacity logits,
unnormalized quaternions, zero normals).  The normals are present but unused
— both loaders must skip them by name, exactly like the reference.

Deterministic (seeded); re-running reproduces the committed file byte-for-
byte.  384 gaussians ≈ 95 KB.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vk3dgaussiansplatting_tpu.io import ply  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "gs_export_384.ply"
)
N = 384


def build_columns():
    rng = np.random.default_rng(20260820)
    # A shell of gaussians around the origin, viewable from (0, 0, 2.5).
    # Positions are written RAW (the loader negates x and y,
    # ResourceManager.cpp:231-236).
    theta = rng.uniform(0, 2 * np.pi, N)
    phi = np.arccos(rng.uniform(-0.6, 0.6, N))
    r = rng.uniform(0.4, 1.4, N)
    pos = np.stack(
        [
            r * np.sin(phi) * np.cos(theta),
            r * np.cos(phi) * 0.6,
            r * np.sin(phi) * np.sin(theta) * 0.5 - 0.5,
        ],
        axis=1,
    ).astype(np.float32)

    cols = {}
    cols["x"], cols["y"], cols["z"] = pos[:, 0], pos[:, 1], pos[:, 2]
    for nm in ("nx", "ny", "nz"):  # real exports carry zero normals
        cols[nm] = np.zeros(N, np.float32)
    # SH DC around mid-gray: dc = (rgb - 0.5) / C0 with rgb in [0.1, 0.9].
    c0 = 0.28209479177387814
    for ch in range(3):
        rgb = rng.uniform(0.1, 0.9, N)
        cols[f"f_dc_{ch}"] = ((rgb - 0.5) / c0).astype(np.float32)
    for i in range(45):  # higher-order SH: small
        cols[f"f_rest_{i}"] = (rng.normal(0, 0.05, N)).astype(np.float32)
    # Opacity logits (pre-sigmoid, ResourceManager.cpp:263).
    cols["opacity"] = rng.normal(1.5, 1.5, N).astype(np.float32)
    # Log scales (pre-exp, ResourceManager.cpp:237-242).
    for i in range(3):
        cols[f"scale_{i}"] = rng.normal(np.log(0.06), 0.4, N).astype(np.float32)
    # Unnormalized quaternions (loader normalizes + permutes,
    # ResourceManager.cpp:243-257).
    for i in range(4):
        cols[f"rot_{i}"] = rng.normal(0, 1, N).astype(np.float32)
    return cols


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    ply.write_ply(OUT, build_columns(), binary=True)
    print(f"wrote {os.path.normpath(OUT)} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
