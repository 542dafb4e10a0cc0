"""Projection math parity: JAX ops vs the numpy oracle.

The oracle implements the GLSL formulas with full 3x3 matrix products
(Common.glsl) while render.project uses the restructured VPU-friendly
contraction; agreement to float32 tolerance validates the re-derivation.
"""

import numpy as np
import jax.numpy as jnp

from vk3dgaussiansplatting_tpu.core.config import RenderConfig, SphericalHarmonicsMode
from vk3dgaussiansplatting_tpu.oracle import numpy_oracle as oracle
from vk3dgaussiansplatting_tpu.render import project
from vk3dgaussiansplatting_tpu.render.camera import Camera, look_at, perspective


def _random_gaussians(rng, n):
    scale = np.exp(rng.normal(-2, 0.5, size=(n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pos = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-8, -0.5, size=n)  # in front of an identity camera
    return pos, scale, q.astype(np.float32)


def test_look_at_matches_glm_semantics():
    view = look_at((0, 0, 2), (0, 0, 1), (0, 1, 0))
    # Camera at z=2 looking toward -z: world origin -> view (0,0,-2)
    p = view @ np.array([0, 0, 0, 1.0], dtype=np.float32)
    np.testing.assert_allclose(p[:3], [0, 0, -2], atol=1e-6)


def test_perspective_matches_glm_rh_no():
    proj = perspective(np.radians(90.0), 16 / 9, 0.1, 100.0)
    # point on the near plane maps to ndc z = -1, far plane to +1
    for z, expect in [(-0.1, -1.0), (-100.0, 1.0)]:
        clip = proj @ np.array([0, 0, z, 1.0], dtype=np.float32)
        np.testing.assert_allclose(clip[2] / clip[3], expect, atol=1e-4)


def test_quat_rot_matrix_is_rotation(rng):
    _, _, q = _random_gaussians(rng, 32)
    m = np.asarray(project.quat_rot_matrix(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_cov2d_matches_oracle(rng):
    config = RenderConfig(width=1280, height=720)
    cam = Camera(1280 / 720)
    cam.set_position((0.3, -0.2, 2.0))
    cam.set_rotation(3.0, -0.2)
    view, _ = cam.matrices()

    pos, scale, q = _random_gaussians(rng, 256)
    pos_view = (pos @ view[:3, :3].T + view[:3, 3]).astype(np.float32)
    got = np.asarray(
        project.compute_cov2d(
            jnp.asarray(scale), jnp.asarray(q), jnp.asarray(pos_view), jnp.asarray(view), config
        )
    )
    # Canonical numpy mirror: must agree to within a few ULP (identical
    # association; only backend FMA contraction may differ).
    want = oracle.compute_cov2d_np(scale, q, pos_view, view, config)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # GLSL-order 3x3 products: float32 reassociation tolerance.
    want_glsl = oracle.compute_cov2d_glsl_np(scale, q, pos_view, view, config)
    np.testing.assert_allclose(got, want_glsl, rtol=2e-4, atol=2e-4)


def test_screen_pos_and_depth_key_match_oracle(rng):
    config = RenderConfig(width=1600, height=900)
    cam = Camera(1600 / 900)
    view, proj = cam.matrices()
    pos, _, _ = _random_gaussians(rng, 512)
    pos_view = (pos @ view[:3, :3].T + view[:3, 3]).astype(np.float32)

    sp = np.asarray(project.screen_space_position(jnp.asarray(pos_view), jnp.asarray(proj), config))
    sp_ref = oracle.screen_space_position_np(pos_view, proj, config)
    np.testing.assert_allclose(sp, sp_ref, rtol=1e-5, atol=1e-3)

    dk = np.asarray(project.depth_key(jnp.asarray(pos_view[:, 2]), config))
    dk_ref = oracle.depth_key_np(pos_view[:, 2], config)
    np.testing.assert_array_equal(dk, dk_ref)


def test_depth_key_saturation():
    config = RenderConfig()
    # behind far plane -> clamp to 1 -> saturate to MAX_UINT32
    z = jnp.asarray([-1000.0, -config.near_plane - 1e-5, -50.0], dtype=jnp.float32)
    keys = np.asarray(project.depth_key(z, config))
    assert keys[0] == 0xFFFFFFFF
    assert keys[1] < 1000
    assert 0 < keys[2] < 0xFFFFFFFF


def test_sh_basis_matches_oracle(rng):
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    got = np.asarray(project.sh_basis16(jnp.asarray(d)))
    want = oracle.sh_basis16_np(d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sh_color_modes_match_oracle(rng):
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    sh = rng.normal(0, 0.3, size=(64, 16, 3)).astype(np.float32)
    for mode in SphericalHarmonicsMode:
        got = np.asarray(project.sh_color(jnp.asarray(d), jnp.asarray(sh), mode))
        want = oracle.sh_color_np(d, sh, mode)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert (got >= 0).all()


def test_tile_extents_truncation_semantics():
    """GLSL int() truncates toward zero — check a gaussian just off-screen
    left still touches tile 0 via truncation (InitSortList.comp:59-65)."""
    config = RenderConfig(width=64, height=64)
    screen = jnp.asarray([[-4.0, 32.0]], dtype=jnp.float32)  # sx-r = -9, sx+r = 1
    cov = jnp.asarray([[(5.0 / 3.0) ** 2, 0.0, (5.0 / 3.0) ** 2]], dtype=jnp.float32)
    ext = np.asarray(project.tile_extents(screen, cov, config))
    assert ext[0, 0] == 0  # clamped min
    assert ext[0, 2] == 1  # int(1/16)+1 = 1
