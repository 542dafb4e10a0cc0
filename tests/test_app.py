"""App-shell tests: engine loop, input, camera controls, debug utilities."""

import json
import math
import os

import numpy as np
import pytest

from vk3dgaussiansplatting_tpu.core.config import (
    RenderConfig,
    SortAlgorithm,
    SphericalHarmonicsMode,
)
from vk3dgaussiansplatting_tpu.app.engine import Engine
from vk3dgaussiansplatting_tpu.app.input import InputState
from vk3dgaussiansplatting_tpu.render.camera import (
    Camera,
    garden_benchmark_camera,
    train_benchmark_camera,
)
from vk3dgaussiansplatting_tpu.scenes.synthetic import SimpleTestGaussiansScene

CONFIG = RenderConfig(
    width=128, height=128, capacity_slack_per_tile=16,
    sort_algorithm=SortAlgorithm.XLA_SORT,
)


def test_engine_runs_frames():
    eng = Engine(CONFIG, use_pallas_blend=False)
    eng.init(SimpleTestGaussiansScene(aspect=1.0))
    frames = []
    eng.run(2, on_frame=lambda i, img: frames.append(img), log_fps=False)
    assert len(frames) == 2
    assert frames[0].shape == (128, 128, 4)
    np.testing.assert_array_equal(frames[0], frames[1])  # static camera


def test_fly_controls_change_frame():
    eng = Engine(CONFIG, use_pallas_blend=False)
    eng.init(SimpleTestGaussiansScene(aspect=1.0))
    frames = []
    eng.input.press("w")
    eng.run(2, on_frame=lambda i, img: frames.append(img), log_fps=False)
    assert not np.array_equal(frames[0], frames[1])


def test_sh_hotkeys():
    eng = Engine(CONFIG, use_pallas_blend=False)
    eng.init(SimpleTestGaussiansScene(aspect=1.0))
    eng.input.press("2")
    eng.run(1, log_fps=False)
    assert eng.scene_manager.current.camera.sh_mode == SphericalHarmonicsMode.SKIP_FIRST_BAND


def test_memory_dump_hotkey(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    eng = Engine(CONFIG, use_pallas_blend=False)
    eng.init(SimpleTestGaussiansScene(aspect=1.0))
    eng.input.press("t")
    eng.run(1, log_fps=False)
    dump = json.load(open(tmp_path / "MemDump.json"))
    assert dump["total_tracked_bytes"] > 0
    assert len(dump["arrays"]) > 0


def test_camera_pitch_clamp():
    cam = Camera(1.0)
    cam.rotate(0.0, 10.0)
    assert cam.pitch < math.pi / 2
    cam.rotate(0.0, -20.0)
    assert cam.pitch > -math.pi / 2


def test_benchmark_cameras_pinned():
    g = garden_benchmark_camera(16 / 9)
    np.testing.assert_allclose(
        g.position, [-0.620010, 0.189628, 2.271181], rtol=1e-6
    )
    t = train_benchmark_camera(16 / 9)
    assert t.yaw == 1.361593 and t.pitch == 0.005841


def test_input_axis():
    inp = InputState()
    inp.press("w")
    assert inp.axis("w", "s") == 1.0
    inp.press("s")
    assert inp.axis("w", "s") == 0.0
    inp.release("w")
    assert inp.axis("w", "s") == -1.0


def test_cli_main(tmp_path):
    from vk3dgaussiansplatting_tpu.app.cli import main

    out = tmp_path / "f.png"
    rc = main([
        "--cpu", "--scene", "simple", "--width", "128", "--height", "128",
        "--frames", "1", "--slack", "16", "--sort", "xla",
        "--no-pallas", "--out", str(out),
    ])
    assert rc == 0
    assert out.exists()


def test_device_report_and_suitability():
    from vk3dgaussiansplatting_tpu.utils.device import check_suitability, device_report

    info = device_report()
    assert info["platform"] == "cpu"
    assert info["num_devices"] == 8
    assert check_suitability(1)
    assert not check_suitability(100)


def test_auto_tier_dispatch(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
    from vk3dgaussiansplatting_tpu.ops.keygen import SortElements
    from vk3dgaussiansplatting_tpu.ops.sort import sort_elements, sort_elements_xla

    cfg = RenderConfig(width=128, height=128, sort_algorithm=SortAlgorithm.AUTO)
    e = 1024
    el = SortElements(
        tile=jnp.asarray(rng.integers(0, 64, e).astype(np.uint32)),
        depth=jnp.asarray(rng.integers(0, 1 << 20, e).astype(np.uint32)),
        index=jnp.arange(e, dtype=jnp.uint32),
        count=jnp.uint32(e),
    )
    a = sort_elements(el, cfg)
    b = sort_elements_xla(el)
    np.testing.assert_array_equal(np.asarray(a.tile), np.asarray(b.tile))
    np.testing.assert_array_equal(np.asarray(a.index), np.asarray(b.index))
