"""Pallas blend kernel parity (interpret mode on CPU) vs XLA tier and oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.ops import keygen, ranges as ranges_ops, sort as sort_ops
from vk3dgaussiansplatting_tpu.ops import blend as blend_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
from vk3dgaussiansplatting_tpu.oracle.numpy_oracle import render_frame_oracle
from vk3dgaussiansplatting_tpu.scenes.synthetic import (
    SimpleTestGaussiansScene,
    TestSortScene,
)

CONFIG = RenderConfig(
    width=128,
    height=128,
    capacity_slack_per_tile=32,
    sort_algorithm=SortAlgorithm.XLA_SORT,
)


def _prepare(scene_cls):
    scene = scene_cls(aspect=CONFIG.aspect)
    scene.init()
    scene.camera.set_aspect(CONFIG.aspect)
    table = jax.tree.map(jnp.asarray, scene.gaussians())
    view, proj = scene.camera.matrices()
    capacity = CONFIG.sort_capacity(int(table.position.shape[0]))
    elements, frame = keygen.generate_sort_elements(
        table,
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(scene.camera.position),
        CONFIG,
        capacity,
    )
    elements = sort_ops.sort_elements(elements, CONFIG)
    ranges = ranges_ops.find_ranges(elements, CONFIG.num_tiles)
    return scene, elements, ranges, frame


@pytest.mark.parametrize("scene_cls", [SimpleTestGaussiansScene, TestSortScene])
def test_pallas_blend_matches_xla_tier(scene_cls):
    scene, elements, ranges, frame = _prepare(scene_cls)
    img_xla = np.asarray(blend_ops.blend_tiles_xla(elements, ranges, frame, CONFIG))
    img_pl = np.asarray(
        blend_kernel.blend_tiles_pallas(elements, ranges, frame, CONFIG)
    )
    assert img_pl.shape == img_xla.shape
    np.testing.assert_allclose(img_pl, img_xla, atol=5e-3)
    assert img_pl.max() > 0


@pytest.mark.parametrize("scene_cls", [SimpleTestGaussiansScene, TestSortScene])
def test_flat_blend_matches_tiled_kernel(scene_cls):
    scene, elements, ranges, frame = _prepare(scene_cls)
    img_tiled = np.asarray(
        blend_kernel.blend_tiles_pallas(elements, ranges, frame, CONFIG)
    )
    img_flat = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, CONFIG)
    )
    # Identical math and batch boundaries -> bit-identical results.
    np.testing.assert_array_equal(img_flat, img_tiled)
    assert img_flat.max() > 0


def test_pallas_blend_matches_oracle():
    scene, elements, ranges, frame = _prepare(SimpleTestGaussiansScene)
    oracle = render_frame_oracle(scene.gaussians(), scene.camera, CONFIG)
    img_pl = np.asarray(
        blend_kernel.blend_tiles_pallas(elements, ranges, frame, CONFIG)
    )
    np.testing.assert_allclose(img_pl, oracle.image, atol=2e-3)
    u8 = np.asarray(blend_ops.quantize_image(jnp.asarray(img_pl)))
    diff = np.abs(
        u8[..., :3].astype(np.int32) - oracle.image_u8[..., :3].astype(np.int32)
    )
    assert diff.max() <= 1


def test_pallas_blend_k256_matches_k512():
    """blend_batch_k is a pure schedule knob: results match across widths."""
    import dataclasses

    scene, elements, ranges, frame = _prepare(SimpleTestGaussiansScene)
    img512 = np.asarray(
        blend_kernel.blend_tiles_pallas(elements, ranges, frame, CONFIG)
    )
    cfg256 = dataclasses.replace(CONFIG, blend_batch_k=256)
    img256 = np.asarray(
        blend_kernel.blend_tiles_pallas(elements, ranges, frame, cfg256)
    )
    # Different batch boundaries reassociate the cumprod: tolerance, not bits.
    np.testing.assert_allclose(img256, img512, atol=1e-4)
    flat256 = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, cfg256)
    )
    np.testing.assert_array_equal(flat256, img256)


def test_split_feature_tables_roundtrip(rng):
    """pack_feature_tables2 + rows_from_tables2 must reproduce the wide
    feature rows: f32 columns exactly, rgb to f16 precision (~5e-4)."""
    import numpy as np
    import jax.numpy as jnp

    from vk3dgaussiansplatting_tpu.ops.keygen import GaussianFrameData
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

    n = 1000
    frame = GaussianFrameData(
        color_alpha=jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32)),
        cov2d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        cov_inv=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        screen_pos=jnp.asarray(
            rng.uniform(-500, 2500, (n, 2)).astype(np.float32)
        ),
    )
    wide = np.asarray(bk.pack_feature_table(frame))
    ta, tb = bk.pack_feature_tables2(frame)
    idx = jnp.asarray(rng.integers(0, n, 4096).astype(np.int32))
    rows = np.asarray(
        bk.rows_from_tables2(
            jnp.take(ta, idx, axis=0), jnp.take(tb, idx, axis=0)
        )
    )
    want = wide[np.asarray(idx)]
    # f32 columns bit-exact: gx, gy, a', b', c', pad, galpha
    for col in (0, 1, 2, 3, 4, 5, 9):
        np.testing.assert_array_equal(rows[:, col], want[:, col], err_msg=str(col))
    # rgb to f16 relative precision
    np.testing.assert_allclose(rows[:, 6:9], want[:, 6:9], rtol=1e-3, atol=1e-3)


def test_feature_table6_roundtrip(rng):
    """pack_feature_table6 + rows_from_table6 must reproduce the wide
    feature rows: screen position exactly (f32), cov/opacity/rgb to f16
    relative precision (the r5 single-width-6 transport)."""
    import numpy as np
    import jax.numpy as jnp

    from vk3dgaussiansplatting_tpu.ops.keygen import GaussianFrameData
    from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel as bk

    n = 1000
    frame = GaussianFrameData(
        color_alpha=jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32)),
        cov2d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        cov_inv=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        screen_pos=jnp.asarray(
            rng.uniform(-500, 2500, (n, 2)).astype(np.float32)
        ),
    )
    wide = np.asarray(bk.pack_feature_table(frame))
    t6 = bk.pack_feature_table6(frame)
    assert t6.shape == (n, 6)
    idx = jnp.asarray(rng.integers(0, n, 4096).astype(np.int32))
    rows = np.asarray(bk.rows_from_table6(jnp.take(t6, idx, axis=0)))
    want = wide[np.asarray(idx)]
    # screen position bit-exact (f32 transport); pad column zero
    for col in (0, 1, 5):
        np.testing.assert_array_equal(rows[:, col], want[:, col], err_msg=str(col))
    # cov', rgb, galpha to f16 relative precision
    for col in (2, 3, 4, 6, 7, 8, 9):
        np.testing.assert_allclose(
            rows[:, col], want[:, col], rtol=1e-3, atol=1e-6, err_msg=str(col)
        )
