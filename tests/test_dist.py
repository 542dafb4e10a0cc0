"""Distributed pipeline tests on the virtual 8-device CPU mesh.

N-device rendering must match the single-device pipeline: exact integer
element routing, float-tolerance images (SURVEY.md §7 step 6).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.models.gaussians import GaussianTable
from vk3dgaussiansplatting_tpu.parallel import dist as dist_mod
from vk3dgaussiansplatting_tpu.parallel.mesh import make_mesh
from vk3dgaussiansplatting_tpu.pipeline import Renderer
from vk3dgaussiansplatting_tpu.scenes.synthetic import (
    SimpleTestGaussiansScene,
    procedural_cloud_table,
)

NDEV = 4

CONFIG = RenderConfig(
    width=128,
    height=128,  # 8 tile rows -> 2 rows per device at NDEV=4
    capacity_slack_per_tile=32,
    sort_algorithm=SortAlgorithm.XLA_SORT,
)


@pytest.fixture(scope="module")
def scene():
    s = SimpleTestGaussiansScene(aspect=CONFIG.aspect)
    s.init()
    s.camera.set_aspect(CONFIG.aspect)
    return s


def test_single_vs_multi_device(scene):
    table = scene.gaussians()
    # single-device reference
    renderer = Renderer(CONFIG, use_pallas_blend=False)
    renderer.init_for_scene(table)
    ref = np.asarray(renderer.draw(scene.camera).image)

    # 4-device distributed
    mesh = make_mesh(NDEV)
    padded = dist_mod._pad_table(table, NDEV)
    plan = dist_mod.plan_distribution(CONFIG, padded.num_gaussians, NDEV)
    fn = dist_mod.make_distributed_render(mesh, CONFIG, plan)
    view, proj = scene.camera.matrices()
    img, dropped = fn(
        jax.tree.map(jnp.asarray, padded),
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(scene.camera.position),
    )
    img = np.asarray(img)[: CONFIG.height, : CONFIG.width]
    assert img.shape == ref.shape
    assert int(np.sum(np.asarray(dropped))) == 0
    np.testing.assert_allclose(img, ref, atol=2e-3)
    assert img.max() > 0


def test_multi_device_random_cloud():
    table = procedural_cloud_table(512, seed=7, extent=3.0, scale_log_mean=-2.5)
    from vk3dgaussiansplatting_tpu.render.camera import Camera

    cam = Camera(CONFIG.aspect)
    cam.set_position((0.0, 0.0, 5.0))
    cam.set_rotation(np.pi, 0.0)

    renderer = Renderer(CONFIG, use_pallas_blend=False)
    renderer.init_for_scene(table)
    ref = np.asarray(renderer.draw(cam).image)

    mesh = make_mesh(NDEV)
    padded = dist_mod._pad_table(table, NDEV)
    plan = dist_mod.plan_distribution(CONFIG, padded.num_gaussians, NDEV)
    fn = dist_mod.make_distributed_render(mesh, CONFIG, plan)
    view, proj = cam.matrices()
    img, dropped = fn(
        jax.tree.map(jnp.asarray, padded),
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(cam.position),
    )
    img = np.asarray(img)[: CONFIG.height, : CONFIG.width]
    assert int(np.sum(np.asarray(dropped))) == 0
    np.testing.assert_allclose(img, ref, atol=2e-3)
    assert img.max() > 0


def test_plan_validation():
    with pytest.raises(ValueError):
        dist_mod.plan_distribution(RenderConfig(width=128, height=112), 100, 8)


def test_multi_device_pallas_blend_parity(scene):
    """The banded distributed path with the Pallas carry-blend tier matches
    the XLA carry-blend tier (interpret mode on CPU)."""
    table = scene.gaussians()
    mesh = make_mesh(NDEV)
    padded = dist_mod._pad_table(table, NDEV)
    plan = dist_mod.plan_distribution(CONFIG, padded.num_gaussians, NDEV)
    view, proj = scene.camera.matrices()
    args = (
        jax.tree.map(jnp.asarray, padded),
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(scene.camera.position),
    )
    img_x = np.asarray(
        dist_mod.make_distributed_render(mesh, CONFIG, plan)(*args)[0]
    )
    img_p = np.asarray(
        dist_mod.make_distributed_render(
            mesh, CONFIG, plan, use_pallas_blend=True
        )(*args)[0]
    )
    np.testing.assert_allclose(img_p, img_x, atol=5e-3)
    assert img_p.max() > 0
