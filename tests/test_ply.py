"""PLY IO + load-time transform tests (golden values on handcrafted files).

Reference behaviours under test: ResourceManager::loadGaussians transforms
(ResourceManager.cpp:227-282) and the Morton-order sort (:283-297).
"""

import math

import numpy as np
import pytest

from vk3dgaussiansplatting_tpu.io import ply
from vk3dgaussiansplatting_tpu.models.gaussians import from_raw_ply_columns
from vk3dgaussiansplatting_tpu.utils.morton import encode_zorder, morton_order


def _gaussian_ply_columns(n, rng):
    cols = {}
    cols["x"] = rng.normal(size=n).astype(np.float32)
    cols["y"] = rng.normal(size=n).astype(np.float32)
    cols["z"] = rng.normal(size=n).astype(np.float32)
    for i in range(3):
        cols[f"scale_{i}"] = rng.normal(size=n).astype(np.float32)
    for i in range(4):
        cols[f"rot_{i}"] = rng.normal(size=n).astype(np.float32)
    cols["opacity"] = rng.normal(size=n).astype(np.float32)
    for i in range(3):
        cols[f"f_dc_{i}"] = rng.normal(size=n).astype(np.float32)
    for i in range(45):
        cols[f"f_rest_{i}"] = rng.normal(size=n).astype(np.float32)
    return cols


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, rng, binary):
    cols = _gaussian_ply_columns(10, rng)
    path = tmp_path / "test.ply"
    ply.write_ply(path, cols, binary=binary)
    data = ply.read_ply(path)
    element = data.element()
    assert element.count == 10
    for name, ref in cols.items():
        got = element.column(name)
        np.testing.assert_array_equal(got.astype(np.float32), ref)


def test_load_transforms(tmp_path, rng):
    """Golden check of every activation transform on a tiny handcrafted ply."""
    cols = _gaussian_ply_columns(4, rng)
    path = tmp_path / "t.ply"
    ply.write_ply(path, cols)
    got = ply.load_gaussians(path, morton_sort=False)

    # position: (-x, -y, z) (ResourceManager.cpp:231-236)
    np.testing.assert_allclose(got.position[:, 0], -cols["x"])
    np.testing.assert_allclose(got.position[:, 1], -cols["y"])
    np.testing.assert_allclose(got.position[:, 2], cols["z"])
    # scale: exp (ResourceManager.cpp:237-242)
    np.testing.assert_allclose(got.scale[:, 1], np.exp(cols["scale_1"]), rtol=1e-6)
    # rot: normalize then permute (-r2, -r3, r0, -r1) (ResourceManager.cpp:243-257)
    raw = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)
    nrm = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    np.testing.assert_allclose(got.rot[:, 0], -nrm[:, 2], rtol=1e-6)
    np.testing.assert_allclose(got.rot[:, 1], -nrm[:, 3], rtol=1e-6)
    np.testing.assert_allclose(got.rot[:, 2], nrm[:, 0], rtol=1e-6)
    np.testing.assert_allclose(got.rot[:, 3], -nrm[:, 1], rtol=1e-6)
    # opacity: sigmoid (ResourceManager.cpp:263)
    np.testing.assert_allclose(
        got.opacity, 1.0 / (1.0 + np.exp(-cols["opacity"])), rtol=1e-6
    )
    # sh layout: dc then channel-major f_rest (ResourceManager.cpp:264-273)
    np.testing.assert_allclose(got.sh[:, 0, 0], cols["f_dc_0"])
    # f_rest_{c + 15*ch} -> sh[c+1, ch]
    np.testing.assert_allclose(got.sh[:, 1, 0], cols["f_rest_0"])
    np.testing.assert_allclose(got.sh[:, 1, 1], cols["f_rest_15"])
    np.testing.assert_allclose(got.sh[:, 1, 2], cols["f_rest_30"])
    np.testing.assert_allclose(got.sh[:, 15, 0], cols["f_rest_14"])
    np.testing.assert_allclose(got.sh[:, 15, 2], cols["f_rest_44"])


def test_morton_encode_golden():
    """Bit-spread golden values (SMath.h:10-34)."""
    # interleave: key = z<<2 | y<<1 | x per bit triple
    assert encode_zorder(np.array([[1, 0, 0]]))[0] == 1
    assert encode_zorder(np.array([[0, 1, 0]]))[0] == 2
    assert encode_zorder(np.array([[0, 0, 1]]))[0] == 4
    assert encode_zorder(np.array([[2, 0, 0]]))[0] == 8
    assert encode_zorder(np.array([[1023, 1023, 1023]]))[0] == (1 << 30) - 1
    # spot value: x=0b101, y=0b011, z=0b110
    # bits (from LSB): x0=1,y0=1,z0=0 -> 011; x1=0,y1=1,z1=1 -> 110; x2=1,y2=0,z2=1 -> 101
    expected = 0b101_110_011
    assert encode_zorder(np.array([[0b101, 0b011, 0b110]]))[0] == expected


def test_morton_order_sorts_spatially(rng):
    pos = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    order = morton_order(pos)
    assert sorted(order.tolist()) == list(range(100))
    # points at identical positions stay in relative order (stable)
    pos2 = np.zeros((5, 3), dtype=np.float32)
    np.testing.assert_array_equal(morton_order(pos2), np.arange(5))


def test_ply_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"noply\n")
    with pytest.raises(ValueError):
        ply.read_ply(p)


def test_full_ply_pipeline_morton_sorted(tmp_path, rng):
    cols = _gaussian_ply_columns(50, rng)
    path = tmp_path / "s.ply"
    ply.write_ply(path, cols)
    table = ply.load_gaussians(path)
    # Morton order of loaded positions must be the identity (already sorted).
    order = morton_order(table.position)
    np.testing.assert_array_equal(order, np.arange(50))


def test_gaussian_ply_export_round_trip(tmp_path):
    """write_gaussian_ply inverts the reference's load transforms: a
    surface-scene table exported and re-loaded (parser + activations +
    Morton) matches the original up to float32 exp/log round-trips."""
    from vk3dgaussiansplatting_tpu.io.ply import (
        load_gaussians,
        write_gaussian_ply,
    )
    from vk3dgaussiansplatting_tpu.scenes.synthetic import (
        procedural_surface_table,
    )

    table = procedural_surface_table(500, seed=5)
    path = tmp_path / "surface.ply"
    write_gaussian_ply(path, table)
    loaded = load_gaussians(path, morton_sort=False)

    np.testing.assert_allclose(
        loaded.position, table.position, rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(loaded.scale, table.scale, rtol=2e-6)
    # quaternion sign is normalized away by rotation semantics; compare up
    # to the stored permutation round trip exactly
    np.testing.assert_allclose(loaded.rot, table.rot, rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        loaded.opacity, table.opacity, rtol=0, atol=2e-6
    )
    np.testing.assert_allclose(loaded.sh, table.sh, rtol=0, atol=1e-6)

    # Morton-sorted load is a permutation of the same table
    sorted_loaded = load_gaussians(path, morton_sort=True)
    assert sorted_loaded.num_gaussians == table.num_gaussians
    np.testing.assert_allclose(
        np.sort(np.asarray(sorted_loaded.opacity)),
        np.sort(np.asarray(table.opacity)),
        rtol=0,
        atol=2e-6,
    )
