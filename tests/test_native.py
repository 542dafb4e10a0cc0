"""Native C++ PLY loader parity with the Python reader."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from vk3dgaussiansplatting_tpu.io import ply
from vk3dgaussiansplatting_tpu.native import runtime

NATIVE_DIR = Path(__file__).resolve().parent.parent / "vk3dgaussiansplatting_tpu" / "native"


@pytest.fixture(scope="module")
def native_lib():
    lib = runtime.get_lib()
    if lib is None:
        build = NATIVE_DIR / "build.sh"
        try:
            subprocess.run(["sh", str(build)], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("no C++ toolchain available")
        runtime._LIB_TRIED = False
        lib = runtime.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _write_fixture(path, n, rng):
    cols = {}
    for name in ["x", "y", "z", "scale_0", "scale_1", "scale_2",
                 "rot_0", "rot_1", "rot_2", "rot_3", "opacity",
                 "f_dc_0", "f_dc_1", "f_dc_2"] + [f"f_rest_{i}" for i in range(45)]:
        cols[name] = rng.normal(size=n).astype(np.float32)
    ply.write_ply(path, cols)
    return cols


def test_native_matches_python(tmp_path, rng, native_lib):
    path = tmp_path / "fixture.ply"
    _write_fixture(path, 1000, rng)
    native = runtime.try_load_gaussians(path)
    assert native is not None
    python = ply.gaussian_columns_from_ply(path)
    for key in python:
        np.testing.assert_array_equal(native[key], python[key], err_msg=key)


def test_native_rejects_ascii(tmp_path, rng, native_lib):
    path = tmp_path / "ascii.ply"
    cols = {n: rng.normal(size=4).astype(np.float32) for n in ["x", "y", "z"]}
    ply.write_ply(path, cols, binary=False)
    assert runtime.try_load_gaussians(path) is None  # python fallback path


def test_load_gaussians_uses_native_transparently(tmp_path, rng, native_lib):
    path = tmp_path / "full.ply"
    _write_fixture(path, 200, rng)
    table = ply.load_gaussians(path)  # goes through the native fast path
    assert table.num_gaussians == 200
    assert np.isfinite(table.position).all()
