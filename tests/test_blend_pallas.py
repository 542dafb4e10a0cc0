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
