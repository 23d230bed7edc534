"""DTU mesh culling by masks + frusta on a synthetic setup."""

import os

import numpy as np
import pytest

from vcr_gaus_tpu.evaluation.dtu_cull import cull_mesh_dtu, load_k_rt_from_p


def test_load_k_rt_roundtrip():
    K = np.array([[800.0, 0, 320, 0], [0, 800, 240, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.1, -0.2, 3.0])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    P = (K @ w2c)[:3]
    K2, pose = load_k_rt_from_p(P)
    np.testing.assert_allclose(K2[:3, :3], K[:3, :3], atol=1e-6)
    np.testing.assert_allclose(np.linalg.inv(pose)[:3, :3], R, atol=1e-6)
    np.testing.assert_allclose(np.linalg.inv(pose)[:3, 3], t, atol=1e-6)


def test_cull_mesh(tmp_path):
    import cv2
    W, H = 320, 240
    inst = str(tmp_path)
    os.makedirs(os.path.join(inst, "mask"))
    # one camera at z=-4 looking +z at the origin
    K = np.array([[300.0, 0, W / 2, 0], [0, 300, H / 2, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    w2c = np.eye(4)
    w2c[2, 3] = 4.0
    P = (K @ w2c)[:3]
    # pad to 4x4 world_mat as DTU stores
    world = np.eye(4)
    world[:3, :4] = P
    np.savez(os.path.join(inst, "cameras.npz"),
             world_mat_0=world, scale_mat_0=np.eye(4))
    # mask: only the left half of the image is object
    m = np.zeros((H, W), np.uint8)
    m[:, : W // 2] = 255
    cv2.imwrite(os.path.join(inst, "mask", "000.png"),
                np.stack([m] * 3, -1))

    # two blobs of vertices: x<0 projects left (kept), x>0 right (culled
    # beyond the 24px dilation)
    left = np.array([[-1.5, 0, 0], [-1.6, 0.1, 0], [-1.4, -0.1, 0.1]])
    right = np.array([[1.5, 0, 0], [1.6, 0.1, 0], [1.4, -0.1, 0.1]])
    verts = np.concatenate([left, right])
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    v2, f2 = cull_mesh_dtu(verts, faces, inst, width=W, height=H,
                           dilate_radius=4)
    assert len(f2) == 1
    assert np.all(v2[:, 0] < 0)
