import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_gaus_tpu.utils import math as M
from vcr_gaus_tpu.utils import sh as SH
from vcr_gaus_tpu.utils import graphics as G


def test_quat_to_rotmat_identity_and_orthonormal():
    q = jnp.array([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5], [2.0, 0, 0, 0]])
    R = M.quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[2], np.eye(3), atol=1e-6)  # normalization
    for i in range(3):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(np.asarray(R[i])) == pytest.approx(1.0, abs=1e-5)


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = np.asarray(M.quat_to_rotmat(jnp.asarray(q[None])))[0]
        q2 = M.rotmat_to_quat(R)
        # q and -q are the same rotation
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-6


def test_covariance_psd_and_values():
    scale = jnp.array([[1.0, 2.0, 3.0]])
    quat = jnp.array([[1.0, 0, 0, 0]])
    cov6 = M.covariance_from_scaling_rotation(scale, quat)
    np.testing.assert_allclose(
        np.asarray(cov6[0]), [1.0, 0, 0, 4.0, 0, 9.0], atol=1e-6)


def test_expon_lr_schedule():
    f = lambda s: float(M.expon_lr(s, 1e-2, 1e-4, max_steps=100))
    assert f(0) == pytest.approx(1e-2, rel=1e-4)
    assert f(100) == pytest.approx(1e-4, rel=1e-4)
    assert f(50) == pytest.approx(1e-3, rel=1e-4)  # geometric midpoint


def test_inside_normalized_translation_and_box():
    xyz = jnp.array([[0.0, 0, 0], [5.0, 0, 0]])
    inside, _ = M.get_inside_normalized(xyz, jnp.zeros(3), jnp.ones(3) * 2)
    assert bool(inside[0]) and not bool(inside[1])
    # oriented 4x4 transform path
    T = jnp.eye(4)
    inside2, pts = M.get_inside_normalized(xyz, T, jnp.ones(3) * 2)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(xyz) / 2, atol=1e-6)


def test_normalize_roundtrip_oriented():
    rng = np.random.default_rng(1)
    T = np.eye(4)
    q = rng.normal(size=4)
    T[:3, :3] = np.asarray(M.quat_to_rotmat(jnp.asarray(q[None])))[0]
    T[:3, 3] = rng.normal(size=3)
    scale = jnp.asarray(np.abs(rng.normal(size=3)) + 0.5)
    pts = jnp.asarray(rng.normal(size=(7, 3)))
    normed = M.normalize_pts(pts, jnp.asarray(T), scale)
    back = M.inv_normalize_pts(normed, jnp.asarray(T), scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_shortest_axis_normal():
    scale = jnp.array([[3.0, 2.0, 0.1]])
    quat = jnp.array([[1.0, 0, 0, 0]])
    n = M.shortest_axis_normal(scale, quat)
    np.testing.assert_allclose(np.abs(np.asarray(n[0])), [0, 0, 1], atol=1e-6)


def test_sh_degree0_and_color_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    sh0 = SH.rgb_to_sh(rgb)
    np.testing.assert_allclose(np.asarray(SH.sh_to_rgb(sh0)), np.asarray(rgb),
                               atol=1e-6)
    coeffs = jnp.zeros((1, 3, 16)).at[:, :, 0].set(sh0)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = SH.eval_sh(3, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out + 0.5), np.asarray(rgb), atol=1e-6)


def test_sh_rotation_invariance_of_dc():
    rng = np.random.default_rng(2)
    coeffs = jnp.asarray(rng.normal(size=(5, 3, 16)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    out = SH.eval_sh(0, coeffs, d1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(coeffs[:, :, 0]) * SH.C0, atol=1e-6)


def test_pixel_dirs_center_ray():
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 32.0, 24.0
    d = G.pixel_dirs(jnp.asarray(K), 48, 64)
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # ray near principal point is ~ +z
    assert float(d[24, 32, 2]) > 0.999


def test_depth_to_points_and_normals_plane():
    # a fronto-parallel plane at z=2 has normal -z or +z
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2], K[1, 2] = 16.0, 12.0
    depth = jnp.full((24, 32), 2.0)
    pts = G.depth_to_points_cam(depth, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.0, atol=1e-6)
    n = G.compute_normals_from_depth(depth, jnp.asarray(K))
    nz = np.asarray(jnp.abs(n[..., 2]))
    np.testing.assert_allclose(nz, 1.0, atol=1e-5)


def test_projection_matrix_matches_reference_convention():
    P = G.projection_matrix(0.01, 100.0, 0.8, 0.6)
    assert P[3, 2] == pytest.approx(1.0)
    assert P[0, 0] == pytest.approx(1.0 / np.tan(0.4))
    assert P[1, 1] == pytest.approx(1.0 / np.tan(0.3))


def test_world_to_view_camera_center():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    Rcw = np.asarray(M.quat_to_rotmat(jnp.asarray(q[None])))[0]  # w2c rot
    t = rng.normal(size=3)
    # reference reader stores R = w2c_rot.T
    W = G.world_to_view(Rcw.T, t)
    C2W = np.linalg.inv(W)
    center = C2W[:3, 3]
    np.testing.assert_allclose(W[:3, :3] @ center + W[:3, 3], 0.0, atol=1e-5)
