"""Temporal depth prefiltering (ops/prefilter.py + CapsState plumbing).

The prefilter drops gaussians at keygen that are provably behind every tile
they touch (depth beyond the tile's published saturation threshold).  The
correctness contract: every dropped element's depth exceeds its tile's
threshold, filtered tiles validate only by saturation at the threshold
crossing, and a filtered tile that fails validation flags the frame and
resets to unfiltered (<= 1 flagged frame per event).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vk3dgaussiansplatting_tpu.core.config import (
    SENTINEL,
    RenderConfig,
    SortAlgorithm,
)
from vk3dgaussiansplatting_tpu.models.gaussians import (
    NUM_SH_COEFFS,
    GaussianTable,
)
from vk3dgaussiansplatting_tpu.ops import capped as capped_ops
from vk3dgaussiansplatting_tpu.ops import keygen, prefilter
from vk3dgaussiansplatting_tpu.ops import ranges as ranges_ops
from vk3dgaussiansplatting_tpu.ops import sort as sort_ops
from vk3dgaussiansplatting_tpu.ops.pallas import blend_kernel
from vk3dgaussiansplatting_tpu.ops.search import two_level_lex_search
from vk3dgaussiansplatting_tpu.render.camera import Camera

CONFIG = RenderConfig(
    width=64,
    height=64,
    capacity_slack_per_tile=512,
    sort_algorithm=SortAlgorithm.XLA_SORT,
    blend_depth_cap=32,
    blend_cap_max=512,
)


def _stacked_table(n, opacity, spread=0.0, seed=9):
    rng = np.random.default_rng(seed)
    z = np.linspace(-1.0, -3.0, n).astype(np.float32)
    position = np.stack(
        [
            rng.uniform(-spread, spread, n).astype(np.float32),
            rng.uniform(-spread, spread, n).astype(np.float32),
            z,
        ],
        axis=1,
    )
    scale = np.full((n, 3), 2.0, np.float32)
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


def _cloud_table(n, seed=3):
    """Scattered cloud: varied rect sizes and tile coverage."""
    rng = np.random.default_rng(seed)
    position = np.stack(
        [
            rng.uniform(-1.5, 1.5, n).astype(np.float32),
            rng.uniform(-1.5, 1.5, n).astype(np.float32),
            rng.uniform(-4.0, -0.5, n).astype(np.float32),
        ],
        axis=1,
    )
    scale = np.exp(rng.normal(-2.2, 0.7, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sh = np.zeros((n, NUM_SH_COEFFS, 3), np.float32)
    sh[:, 0, :] = rng.uniform(0.2, 1.0, (n, 3))
    return GaussianTable(
        position=position,
        scale=scale,
        rot=q.astype(np.float32),
        sh=sh,
        opacity=rng.uniform(0.4, 0.95, n).astype(np.float32),
    )


def _camera():
    cam = Camera(CONFIG.aspect)
    cam.set_position((0.0, 0.0, 2.0))
    cam.set_rotation(np.pi, 0.0)
    return cam


def _frame_inputs(table, cam):
    view, proj = cam.matrices()
    return (
        jax.tree.map(jnp.asarray, table),
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(cam.position),
    )


def _element_set(elements):
    tile = np.asarray(elements.tile)
    live = tile != SENTINEL
    return set(
        zip(
            tile[live].tolist(),
            np.asarray(elements.depth)[live].tolist(),
            np.asarray(elements.index)[live].tolist(),
        )
    )


def test_lex_search_matches_numpy():
    rng = np.random.default_rng(4)
    n = 5000
    hi = np.sort(rng.integers(0, 40, n).astype(np.uint32))
    lo = rng.integers(0, 2**32 - 1, n).astype(np.uint32)
    # sort lo within hi groups (lexicographic order)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    ph = rng.integers(0, 42, 300).astype(np.uint32)
    pl = rng.integers(0, 2**32 - 1, 300).astype(np.uint32)
    got = np.asarray(
        two_level_lex_search(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(ph), jnp.asarray(pl)
        )
    )
    key = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    pkey = ph.astype(np.uint64) << np.uint64(32) | pl.astype(np.uint64)
    want = np.searchsorted(key, pkey, side="left")
    np.testing.assert_array_equal(got, want)


def test_keep_mask_is_conservative():
    """Every element present unfiltered but absent filtered must have
    depth strictly beyond its tile's threshold."""
    # 16x16 tile grid: big enough that SENTINEL tiles do not poison the
    # whole dilated map (at 64x64 the 4x4 grid is one dilation neighborhood)
    config = dataclasses.replace(CONFIG, width=256, height=256)
    table = _cloud_table(400)
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = config.sort_capacity(400)

    rng = np.random.default_rng(8)
    # draw thresholds spanning the scene's actual depth-key range so the
    # filter actually bites (depth fraction (z-near)/(far-near) is small
    # for a z in [-4, -0.5] scene against far=100)
    thr = rng.integers(0, 200_000_000, config.num_tiles).astype(np.uint32)
    # leave a tenth of the tiles unfiltered
    thr[rng.random(config.num_tiles) < 0.1] = SENTINEL
    thr_j = jnp.asarray(thr)

    el_full, _ = keygen.generate_sort_elements(
        tbl, view, proj, pos, config, capacity
    )
    el_filt, _ = keygen.generate_sort_elements(
        tbl, view, proj, pos, config, capacity, depth_thr=thr_j
    )
    full = _element_set(el_full)
    filt = _element_set(el_filt)
    assert filt <= full
    dropped = full - filt
    assert dropped, "fixture produced no drops; weaken thresholds"
    for tile, depth, _idx in dropped:
        assert depth > int(thr[tile]), (tile, depth, int(thr[tile]))
    # all-SENTINEL thresholds are a no-op (bitwise identical path)
    el_nop, _ = keygen.generate_sort_elements(
        tbl, view, proj, pos, config, capacity,
        depth_thr=prefilter.init_thresholds(config),
    )
    assert _element_set(el_nop) == full


def test_dilate_thresholds_is_neighborhood_max():
    rng = np.random.default_rng(5)
    thr = rng.integers(0, 1000, CONFIG.num_tiles).astype(np.uint32)
    d = np.asarray(
        prefilter.dilate_thresholds(jnp.asarray(thr), CONFIG)
    ).reshape(CONFIG.grid_height, CONFIG.grid_width)
    m = thr.reshape(CONFIG.grid_height, CONFIG.grid_width)
    r = prefilter.RADIUS
    for y in range(CONFIG.grid_height):
        for x in range(CONFIG.grid_width):
            y0, y1 = max(0, y - r), min(CONFIG.grid_height, y + r + 1)
            x0, x1 = max(0, x - r), min(CONFIG.grid_width, x + r + 1)
            assert d[y, x] == m[y0:y1, x0:x1].max()


def _run_frame(tbl, view, proj, pos, capacity, state, config=CONFIG):
    thr = state.thr if isinstance(state, capped_ops.CapsState) else None
    elements, frame = keygen.generate_sort_elements(
        tbl, view, proj, pos, config, capacity, depth_thr=thr
    )
    elements = sort_ops.sort_elements(elements, config)
    ranges = ranges_ops.find_ranges(elements, config.num_tiles)
    img, state, ok = capped_ops.blend_tiles_capped_temporal(
        elements, ranges, frame, config, state
    )
    return img, state, ok, int(elements.count)


# 16x16 tile grid with small gaussians: dilated-max lookups stay local, so
# the prefilter actually bites (at a 4x4 grid one dilation neighborhood
# spans the whole screen and any unsaturated tile disables every drop).
PF_CONFIG = dataclasses.replace(
    CONFIG,
    width=256,
    height=256,
    capacity_slack_per_tile=128,
    packed_slack_per_tile=512,
)


def _walled_scene(seed=13, n_front=3000, n_back=1500, wall_opacity=0.98):
    """Front cloud + opaque whole-frame wall + back clutter: the clutter is
    occluded everywhere, so a converged prefilter must drop (some of) it."""
    rng = np.random.default_rng(seed)

    def layer(n, z0, z1, sfrac, op, spread=1.05):
        z = rng.uniform(z0, z1, n).astype(np.float32)
        u = rng.uniform(-spread, spread, n).astype(np.float32)
        v = rng.uniform(-spread, spread, n).astype(np.float32)
        pos = np.stack([u * (-z), v * (-z), z], axis=1).astype(np.float32)
        scale = (sfrac * (-z))[:, None] * np.ones((1, 3), np.float32)
        return pos, scale.astype(np.float32), np.full(n, op, np.float32)

    p1, s1, o1 = layer(n_front, -3.0, -1.0, 0.06, 0.95)
    p2, s2, o2 = layer(20, -3.9, -3.5, 3.0, wall_opacity, spread=0.0)
    p3, s3, o3 = layer(n_back, -8.0, -4.5, 0.04, 0.9)
    pos = np.concatenate([p1, p2, p3])
    scale = np.concatenate([s1, s2, s3])
    op = np.concatenate([o1, o2, o3])
    n = pos.shape[0]
    rot = np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1))
    sh = np.zeros((n, NUM_SH_COEFFS, 3), np.float32)
    sh[:, 0, :] = rng.uniform(0.2, 1.0, (n, 3))
    return GaussianTable(
        position=pos, scale=scale, rot=rot, sh=sh, opacity=op
    ), n


def _full_reference(tbl, view, proj, pos, capacity, config):
    el, fr = keygen.generate_sort_elements(
        tbl, view, proj, pos, config, capacity
    )
    el = sort_ops.sort_elements(el, config)
    rg = ranges_ops.find_ranges(el, config.num_tiles)
    img = np.asarray(blend_kernel.blend_tiles_pallas_flat(el, rg, fr, config))
    return img, int(el.count)


def test_temporal_prefilter_converges_and_stays_exact():
    """Walled scene: thresholds are published after convergence, the live
    element count drops (occluded clutter), and every frame matches the
    full unfiltered render within the 8-bit contract."""
    table, n = _walled_scene()
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = PF_CONFIG.sort_capacity(n)
    img_full, count_full = _full_reference(
        tbl, view, proj, pos, capacity, PF_CONFIG
    )

    state = capped_ops.init_caps_state(PF_CONFIG)
    counts, oks = [], []
    for _ in range(8):
        img, state, ok, cnt = _run_frame(
            tbl, view, proj, pos, capacity, state, config=PF_CONFIG
        )
        counts.append(cnt)
        oks.append(bool(ok))
        q = np.round(np.asarray(img) * 255.0).astype(np.int32)
        qf = np.round(img_full * 255.0).astype(np.int32)
        assert np.abs(q - qf).max() <= 1
    thr = np.asarray(state.thr)
    assert (thr != SENTINEL).sum() > PF_CONFIG.num_tiles // 2
    assert counts[0] == count_full  # first frame unfiltered
    assert counts[-1] < count_full, "prefilter dropped nothing"
    assert oks[-1]


def test_prefilter_miss_is_flagged_and_recovers():
    """After convergence, make the wall translucent (the occluded clutter
    becomes visible): the filtered frame is flagged not-ok, its tiles'
    thresholds reset, and the frames after recovery are exact.  Uses the
    UNDAMPED snap reset (thr_reset_damp=False) — the 1-flagged-frame
    recovery contract; the damped ramp is tested separately."""
    cfg = dataclasses.replace(PF_CONFIG, thr_reset_damp=False)
    cam = _camera()
    table, n = _walled_scene()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = cfg.sort_capacity(n)

    state = capped_ops.init_caps_state(cfg)
    for _ in range(7):
        _img, state, ok, cnt0 = _run_frame(
            tbl, view, proj, pos, capacity, state, config=cfg
        )
    n_filtered = (np.asarray(state.thr) != SENTINEL).sum()
    assert n_filtered > 0
    assert cnt0 < _full_reference(
        tbl, view, proj, pos, capacity, cfg
    )[1], "fixture must be actively filtering before the miss"

    # same geometry, transparent everything: saturation collapses
    translucent = dataclasses.replace(table, opacity=table.opacity * 0.02)
    tbl2 = jax.tree.map(jnp.asarray, translucent)
    _img_miss, state, ok_miss, _ = _run_frame(
        tbl2, view, proj, pos, capacity, state, config=cfg
    )
    assert not bool(ok_miss), "prefilter miss must flag the frame"
    assert (np.asarray(state.thr) == SENTINEL).all(), "thresholds must reset"

    # next frame is unfiltered -> exact vs the full render
    img_full, count_full = _full_reference(
        tbl2, view, proj, pos, capacity, cfg
    )
    img2, state, _ok2, cnt2 = _run_frame(
        tbl2, view, proj, pos, capacity, state, config=cfg
    )
    assert cnt2 == count_full  # unfiltered again
    q = np.round(np.asarray(img2) * 255.0).astype(np.int32)
    qf = np.round(img_full * 255.0).astype(np.int32)
    assert np.abs(q - qf).max() <= 1


def test_prefilter_miss_damped_ramp():
    """With the (default) damped reset, a miss RAISES thresholds toward
    SENTINEL monotonically instead of snapping — the filtered live count
    re-admits geometrically (steady-capacity spike damping, VERDICT r4
    #4) — and reaches the fully-unfiltered exact state within <= 4 frames,
    with every post-recovery frame exact."""
    assert PF_CONFIG.thr_reset_damp  # default on
    cam = _camera()
    table, n = _walled_scene()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = PF_CONFIG.sort_capacity(n)

    state = capped_ops.init_caps_state(PF_CONFIG)
    for _ in range(7):
        _img, state, _ok, _c = _run_frame(
            tbl, view, proj, pos, capacity, state, config=PF_CONFIG
        )
    thr0 = np.asarray(state.thr)
    assert (thr0 != SENTINEL).sum() > 0

    translucent = dataclasses.replace(table, opacity=table.opacity * 0.02)
    tbl2 = jax.tree.map(jnp.asarray, translucent)
    img_full, count_full = _full_reference(
        tbl2, view, proj, pos, capacity, PF_CONFIG
    )

    counts, prev = [], thr0.astype(np.uint64)
    for i in range(5):
        _img, state, ok, cnt = _run_frame(
            tbl2, view, proj, pos, capacity, state, config=PF_CONFIG
        )
        cur = np.asarray(state.thr).astype(np.uint64)
        # thresholds only ever RISE during the ramp (monotone re-admission)
        assert (cur >= prev).all()
        prev = cur
        counts.append(cnt)
        if i == 0:
            assert not bool(ok), "miss frame must be flagged"
            assert (cur == SENTINEL).sum() < PF_CONFIG.num_tiles, (
                "damped reset must NOT snap every threshold at once"
            )
    # geometric re-admission: counts rise toward the full count
    assert counts[-1] == count_full, "ramp must end fully unfiltered"
    assert counts[0] < count_full
    # post-recovery frame is exact vs the full render
    img2, state, ok2, cnt2 = _run_frame(
        tbl2, view, proj, pos, capacity, state, config=PF_CONFIG
    )
    assert cnt2 == count_full and bool(ok2)
    q = np.round(np.asarray(img2) * 255.0).astype(np.int32)
    qf = np.round(img_full * 255.0).astype(np.int32)
    assert np.abs(q - qf).max() <= 1


def test_split_phase_matches_monolithic_with_state():
    """The split path with CapsState reproduces the monolithic path."""
    table, n = _walled_scene(n_front=1200, n_back=600)
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = PF_CONFIG.sort_capacity(n)

    state_m = capped_ops.init_caps_state(PF_CONFIG)
    state_s = capped_ops.init_caps_state(PF_CONFIG)
    for _ in range(5):
        elements, frame = keygen.generate_sort_elements(
            tbl, view, proj, pos, PF_CONFIG, capacity, depth_thr=state_m.thr
        )
        elements = sort_ops.sort_elements(elements, PF_CONFIG)
        ranges = ranges_ops.find_ranges(elements, PF_CONFIG.num_tiles)
        img_m, state_m, ok_m = capped_ops.blend_tiles_capped_temporal(
            elements, ranges, frame, PF_CONFIG, state_m
        )
        img_s, state_s, ok_s, _stats = capped_ops.blend_tiles_capped_split(
            elements, ranges, frame, PF_CONFIG, state_s
        )
        assert bool(ok_m) == bool(ok_s)
        for f in ("caps", "thr", "floor"):
            np.testing.assert_array_equal(
                np.asarray(getattr(state_m, f)),
                np.asarray(getattr(state_s, f)),
            )
        np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))
    assert (np.asarray(state_m.thr) != SENTINEL).any()


def test_chained_plan_steady_switch_end_to_end():
    """pipeline.ChainedTemporalPlan (the production big-scene path, also
    driven by bench.py): warmup at full capacity, steady switch to the
    smaller filtered capacity, frames stay within the 8-bit contract."""
    from vk3dgaussiansplatting_tpu.pipeline import ChainedTemporalPlan

    table, n = _walled_scene(n_front=1200, n_back=600)
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = PF_CONFIG.sort_capacity(n)
    img_full, count_full = _full_reference(
        tbl, view, proj, pos, capacity, PF_CONFIG
    )
    qf = np.round(img_full * 255.0).astype(np.int32)

    logs = []
    plan = ChainedTemporalPlan(
        PF_CONFIG, capacity, steady_frac=0.9, log=logs.append
    )
    for _ in range(8):  # warmup (full capacity, unfiltered keygen)
        img = plan.frame(tbl, view, proj, pos)
        q = np.round(np.asarray(img) * 255.0).astype(np.int32)
        assert np.abs(q - qf).max() <= 1
    assert int(plan.last_count) == count_full
    switched = plan.try_steady_switch(tbl, view, proj, pos)
    assert switched, logs
    assert plan.mode == "steady"
    for _ in range(2):
        img = plan.frame(tbl, view, proj, pos)
        q = np.round(np.asarray(img) * 255.0).astype(np.int32)
        assert np.abs(q - qf).max() <= 1
    assert int(plan.last_count) < count_full  # prefilter active


def test_steady_overflow_is_flagged_and_switch_declines():
    """r4 review findings: (a) a steady-capacity overflow must flag the
    frame (keygen truncation passes range-fit validation silently);
    (b) an infeasible switch is declined ONCE and not re-probed."""
    from vk3dgaussiansplatting_tpu.pipeline import ChainedTemporalPlan

    table, n = _walled_scene(n_front=1200, n_back=600)
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = PF_CONFIG.sort_capacity(n)

    # (b) infeasible: steady capacity far below even the filtered live
    logs = []
    plan = ChainedTemporalPlan(
        PF_CONFIG, capacity, steady_frac=0.05, log=logs.append
    )
    for _ in range(4):
        plan.frame(tbl, view, proj, pos)
    assert not plan.try_steady_switch(tbl, view, proj, pos)
    assert plan.steady_declined
    n_logs = len(logs)
    assert not plan.try_steady_switch(tbl, view, proj, pos)
    assert len(logs) == n_logs  # no re-probe, no new log line

    # (a) force steady mode at the tiny capacity: keygen truncates, the
    # overflow flag fires and demotes ok
    plan.mode = "steady"
    plan.frame(tbl, view, proj, pos)
    assert bool(plan.last_overflow)
    assert not bool(plan.last_ok)
    # (c) the device accumulator caught it too (r4 advisor: a per-window
    # SAMPLE of last_overflow misses overflows on 7 of 8 frames) and pops
    # exactly once
    acc = plan.take_overflow_acc()
    assert acc is not None and bool(acc)
    assert plan.take_overflow_acc() is None


def test_renderer_surfaces_ok_and_reverts_on_overflow(monkeypatch):
    """Renderer.draw (chained-plan path): FrameOutputs.ok is a device
    scalar mirroring plan.last_ok, and a steady-capacity overflow reverts
    the plan to the full set within two 8-frame windows WITHOUT any
    blocking fetch of the current frame (the stale-async protocol)."""
    from vk3dgaussiansplatting_tpu import pipeline as pl

    table, n = _walled_scene(n_front=1200, n_back=600)
    cam = _camera()

    monkeypatch.setattr(pl.Renderer, "BIG_SCENE_CAPACITY", 1)
    monkeypatch.setattr(pl.Renderer, "WARMUP_FRAMES", 4)
    r = pl.Renderer(PF_CONFIG, use_pallas_blend=True, steady_frac=0.9)
    r.init_for_scene(table)
    assert r._plan is not None
    outs = [r.draw(cam) for _ in range(6)]
    assert all(o.ok is not None for o in outs)
    assert bool(outs[-1].ok)  # converged frames validate

    # Force an overflow regime: shrink the steady capacity under the live
    # count and re-enter steady mode.
    plan = r._plan
    assert plan.mode == "steady"
    plan.steady_capacity = 512
    plan._sets.clear()
    plan._first.clear()
    flagged = reverted = False
    for i in range(24):
        out = r.draw(cam)
        flagged |= not bool(out.ok)
        if plan.mode == "full":
            reverted = True
            break
    assert flagged  # degraded frames were signaled through FrameOutputs.ok
    assert reverted  # the stale-window check flipped the plan back to full
    assert not plan.steady_declined  # re-probe allowed later


def test_filtered_keygen_stream_dispatch_matches_repeat():
    """The production dispatch site: under a prefilter the "pallas" method
    routes to the STREAMED expansion kernel (keygen.py r5).  Filtered
    keygen through that path must be bit-identical to the repeat
    expansion with the same thresholds."""
    config = dataclasses.replace(CONFIG, width=256, height=256)
    table = _cloud_table(400)
    cam = _camera()
    tbl, view, proj, pos = _frame_inputs(table, cam)
    capacity = config.sort_capacity(400)

    rng = np.random.default_rng(9)
    thr = rng.integers(0, 200_000_000, config.num_tiles).astype(np.uint32)
    thr[rng.random(config.num_tiles) < 0.1] = SENTINEL
    thr_j = jnp.asarray(thr)

    el_rep, _ = keygen.generate_sort_elements(
        tbl, view, proj, pos,
        dataclasses.replace(config, expansion_method="repeat"),
        capacity, depth_thr=thr_j,
    )
    el_str, _ = keygen.generate_sort_elements(
        tbl, view, proj, pos,
        dataclasses.replace(config, expansion_method="pallas"),
        capacity, depth_thr=thr_j,
    )
    np.testing.assert_array_equal(np.asarray(el_rep.tile), np.asarray(el_str.tile))
    np.testing.assert_array_equal(np.asarray(el_rep.depth), np.asarray(el_str.depth))
    np.testing.assert_array_equal(np.asarray(el_rep.index), np.asarray(el_str.index))
    assert int(el_rep.count) == int(el_str.count)
