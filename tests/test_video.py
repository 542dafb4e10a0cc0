"""Video writer + flythrough tests."""

import math
import os

import numpy as np

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.app.flythrough import interpolate_path, render_flythrough
from vk3dgaussiansplatting_tpu.io.video import VideoWriter
from vk3dgaussiansplatting_tpu.pipeline import Renderer
from vk3dgaussiansplatting_tpu.scenes.synthetic import SimpleTestGaussiansScene

CONFIG = RenderConfig(
    width=64, height=64, capacity_slack_per_tile=16,
    sort_algorithm=SortAlgorithm.XLA_SORT,
)


def test_interpolate_path():
    kf = [((0, 0, 0), 0.0, 0.0), ((2, 0, 0), 1.0, 0.5)]
    path = interpolate_path(kf, 5)
    assert len(path) == 5
    np.testing.assert_allclose(path[0][0], [0, 0, 0])
    np.testing.assert_allclose(path[-1][0], [2, 0, 0], atol=1e-5)
    assert abs(path[2][1] - 0.5) < 0.26  # midpoint-ish yaw


def test_flythrough_gif(tmp_path):
    scene = SimpleTestGaussiansScene(aspect=1.0)
    scene.init()
    renderer = Renderer(CONFIG, use_pallas_blend=False)
    renderer.init_for_scene(scene.gaussians())
    kf = [
        ((0.0, 0.0, 2.0), math.pi, 0.0),
        ((0.5, 0.0, 2.0), math.pi, 0.0),
    ]
    writer = render_flythrough(renderer, kf, 3)
    assert len(writer.frames) == 3
    out = writer.save(str(tmp_path / "fly.gif"), fps=10)
    assert os.path.exists(out) and os.path.getsize(out) > 100


def test_png_sequence(tmp_path):
    w = VideoWriter()
    w.add(np.zeros((8, 8, 4), dtype=np.uint8))
    w.add(np.full((8, 8, 4), 255, dtype=np.uint8))
    out = w.save(str(tmp_path / "seq"))
    assert len(os.listdir(out)) == 2
