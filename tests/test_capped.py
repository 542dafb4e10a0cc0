"""Saturation-truncated blend (ops/capped.py): exactness + fallback.

The capped path blends only each tile's first `blend_depth_cap` sorted
elements; it is exact when every tile either fits the cap or saturates
(all pixels' T < stop) within it, and otherwise falls back in-graph to the
full blend.  Both regimes are exercised here against the uncapped flat
kernel (interpret mode on CPU), plus the packed-layout bookkeeping.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SortAlgorithm
from vk3dgaussiansplatting_tpu.models.gaussians import (
    NUM_SH_COEFFS,
    GaussianTable,
)
from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
from vk3dgaussiansplatting_tpu.ops import keygen, ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
from vk3dgaussiansplatting_tpu.render.camera import Camera

BASE = RenderConfig(
    width=64,
    height=64,
    capacity_slack_per_tile=64,
    sort_algorithm=SortAlgorithm.XLA_SORT,
    blend_depth_cap=8,
)


def _stacked_table(n, opacity, spread=0.0):
    """n large gaussians stacked at increasing depth in front of the camera.

    Each covers the whole (small) frame so every pixel of every covered tile
    sees all n of them; with opacity ~1 the transmittance saturates within a
    few elements, with tiny opacity it never does.
    """
    rng = np.random.default_rng(9)
    z = np.linspace(-1.0, -3.0, n).astype(np.float32)
    position = np.stack(
        [
            rng.uniform(-spread, spread, n).astype(np.float32),
            rng.uniform(-spread, spread, n).astype(np.float32),
            z,
        ],
        axis=1,
    )
    scale = np.full((n, 3), 2.0, np.float32)  # huge: covers the frame
    rot = np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1))
    sh = np.zeros((n, NUM_SH_COEFFS, 3), np.float32)
    sh[:, 0, :] = rng.uniform(0.2, 1.0, (n, 3))
    return GaussianTable(
        position=position,
        scale=scale,
        rot=rot,
        sh=sh,
        opacity=np.full(n, opacity, np.float32),
    )


def _prepare(table, config):
    cam = Camera(config.aspect)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(np.pi, 0.0)
    table = jax.tree.map(jnp.asarray, table)
    view, proj = cam.matrices()
    capacity = config.sort_capacity(int(table.position.shape[0]))
    elements, frame = keygen.generate_sort_elements(
        table,
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(cam.position),
        config,
        capacity,
    )
    elements = sort_ops.sort_elements(elements, config)
    ranges = ranges_ops.find_ranges(elements, config.num_tiles)
    return elements, ranges, frame


def test_saturated_scene_capped_is_exact():
    """Opaque stack deeper than the cap: every covered tile saturates, the
    fast path is taken, and the image matches the uncapped blend."""
    table = _stacked_table(40, opacity=0.95)
    elements, ranges, frame = _prepare(table, BASE)
    r = np.asarray(ranges[:, 1] - ranges[:, 0]).astype(np.int64)
    assert r.max() > BASE.blend_depth_cap, "test needs ranges beyond the cap"

    img_full = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, BASE)
    )
    img_cap = np.asarray(
        capped_ops.blend_tiles_capped(elements, ranges, frame, BASE)
    )
    # Batch regrouping may move final-ulp floats; the 8-bit contract holds.
    q_full = np.round(img_full * 255.0).astype(np.int32)
    q_cap = np.round(img_cap * 255.0).astype(np.int32)
    assert np.abs(q_full - q_cap).max() <= 1
    assert img_cap.max() > 0


def test_translucent_scene_falls_back_exactly():
    """Tiny-opacity stack deeper than the cap: no tile saturates, the
    validation fails, and the fallback reproduces the full blend exactly."""
    table = _stacked_table(40, opacity=0.01)
    elements, ranges, frame = _prepare(table, BASE)
    r = np.asarray(ranges[:, 1] - ranges[:, 0]).astype(np.int64)
    assert r.max() > BASE.blend_depth_cap

    img_full = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, BASE)
    )
    img_cap = np.asarray(
        capped_ops.blend_tiles_capped(elements, ranges, frame, BASE)
    )
    np.testing.assert_array_equal(img_cap, img_full)


def test_ranges_within_cap_trivially_exact():
    """Shallow scene (every range fits the cap): fast path, exact."""
    config = dataclasses.replace(BASE, blend_depth_cap=64)
    table = _stacked_table(5, opacity=0.5)
    elements, ranges, frame = _prepare(table, config)
    r = np.asarray(ranges[:, 1] - ranges[:, 0]).astype(np.int64)
    assert r.max() <= config.blend_depth_cap

    img_full = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, config)
    )
    img_cap = np.asarray(
        capped_ops.blend_tiles_capped(elements, ranges, frame, config)
    )
    q_full = np.round(img_full * 255.0).astype(np.int32)
    q_cap = np.round(img_cap * 255.0).astype(np.int32)
    assert np.abs(q_full - q_cap).max() <= 1


def test_packed_capacity_bounds():
    cfg = dataclasses.replace(BASE, blend_depth_cap=512)
    ep = capped_ops.packed_capacity(cfg, capacity=100_000)
    assert ep >= 0
    # never exceeds either bound (cap slab + misalignment-lead chunk)
    assert ep <= cfg.num_tiles * (512 + 128)
    assert ep <= -(-100_000 // 128) * 128 + 2 * 128 * cfg.num_tiles


# ---------------------------------------------------------------------------
# Temporal per-tile caps
# ---------------------------------------------------------------------------


def test_temporal_caps_converge_and_stay_exact():
    """Translucent stack: frame 1 fails validation (falls back, exact),
    caps escalate, and a later frame validates once caps cover the need."""
    config = dataclasses.replace(BASE, blend_depth_cap=8, blend_cap_max=64)
    table = _stacked_table(40, opacity=0.01)
    elements, ranges, frame = _prepare(table, config)
    img_full = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, config)
    )

    caps = capped_ops.init_caps(config)
    caps_hist = [np.asarray(caps).copy()]
    oks = []
    for _ in range(4):
        img, caps, ok = capped_ops.blend_tiles_capped_temporal(
            elements, ranges, frame, config, caps
        )
        oks.append(bool(ok))
        caps_hist.append(np.asarray(caps).copy())
        # exact every frame (capped-valid, patched, or fallback)
        q = np.round(np.asarray(img) * 255.0).astype(np.int32)
        qf = np.round(img_full * 255.0).astype(np.int32)
        assert np.abs(q - qf).max() <= 1
    # ranges (40 elements) exceed base cap 8 but fit cap_max 64: the
    # unsaturated tiles must escalate 8 -> 16 -> 32 -> 64 across frames
    # (the bounded patch pass keeps even pre-convergence frames cheap and
    # exact, so `ok` may be True throughout)
    assert caps_hist[1].max() > caps_hist[0].max()
    assert caps_hist[-1].max() == 64
    assert oks[-1]


def test_temporal_caps_saturated_fast_path():
    """Deep opaque stack with ranges beyond cap_max: validation must come
    from per-pixel saturation (T < stop at the cap), not range fit, and the
    converged frames are exact."""
    config = dataclasses.replace(
        BASE,
        blend_depth_cap=32,
        blend_cap_max=512,
        capacity_slack_per_tile=512,  # ranges must not capacity-truncate
    )
    table = _stacked_table(300, opacity=0.95)
    elements, ranges, frame = _prepare(table, config)
    img_full = np.asarray(
        blend_kernel.blend_tiles_pallas_flat(elements, ranges, frame, config)
    )
    caps = capped_ops.init_caps(config)
    ok = False
    for _ in range(5):
        caps_in = caps
        img, caps, ok = capped_ops.blend_tiles_capped_temporal(
            elements, ranges, frame, config, caps
        )
        q = np.round(np.asarray(img) * 255.0).astype(np.int32)
        qf = np.round(img_full * 255.0).astype(np.int32)
        assert np.abs(q - qf).max() <= 1
    assert bool(ok)
    # most covered tiles' ranges exceed their converged cap -> their
    # validity is saturation-based (T < stop at the cap), not range fit
    r = np.asarray(ranges[:, 1].astype(jnp.int32) - ranges[:, 0].astype(jnp.int32))
    sat_valid = (r > np.asarray(caps_in)) & (r > 0)
    assert sat_valid.sum() >= valid_count_min(r)


def valid_count_min(r):
    return max(1, (r > 0).sum() // 2)


def test_temporal_caps_decay():
    """Caps escalated for a deep scene decay back once ranges shrink."""
    config = dataclasses.replace(BASE, blend_depth_cap=8, blend_cap_max=64)
    shallow = _stacked_table(3, opacity=0.5)
    elements, ranges, frame = _prepare(shallow, config)
    caps = jnp.full((config.num_tiles,), 64, jnp.int32)  # escalated earlier
    _img, caps2, ok = capped_ops.blend_tiles_capped_temporal(
        elements, ranges, frame, config, caps
    )
    assert bool(ok)
    # ranges are ~3 elements -> caps halve toward the base
    assert int(jnp.max(caps2)) <= 32


def test_split_phase_matches_monolithic():
    """The three-program split path must reproduce the monolithic temporal
    path (identical caps updates, ok flag, and image)."""
    config = dataclasses.replace(BASE, blend_depth_cap=8, blend_cap_max=64)
    table = _stacked_table(40, opacity=0.01)
    elements, ranges, frame = _prepare(table, config)
    caps_m = capped_ops.init_caps(config)
    caps_s = capped_ops.init_caps(config)
    for _ in range(3):
        img_m, caps_m, ok_m = capped_ops.blend_tiles_capped_temporal(
            elements, ranges, frame, config, caps_m
        )
        img_s, caps_s, ok_s, _stats = capped_ops.blend_tiles_capped_split(
            elements, ranges, frame, config, caps_s
        )
        assert bool(ok_m) == bool(ok_s)
        np.testing.assert_array_equal(np.asarray(caps_m), np.asarray(caps_s))
        np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))
