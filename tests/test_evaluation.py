"""Geometry + NVS evaluators on analytic shapes."""

import numpy as np
import pytest

from vcr_gaus_tpu.evaluation import geometry as GE
from vcr_gaus_tpu.evaluation import nvs


def sphere_mesh(r=1.0, n=24):
    from vcr_gaus_tpu.meshing.marching import marching_tets
    ax = np.linspace(-1.5, 1.5, n)
    sp = ax[1] - ax[0]
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = (np.sqrt(x**2 + y**2 + z**2) - r).astype(np.float32)
    return marching_tets(sdf, 0.0, origin=(-1.5,) * 3, spacing=(sp,) * 3)


def test_sampling_density():
    verts, faces = sphere_mesh()
    pts = GE.sample_points_on_mesh(verts, faces, density_thresh=0.05)
    assert len(pts) > len(verts)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)


def test_downsample_variants():
    rng = np.random.default_rng(0)
    pts = rng.random((5000, 3))
    vd = GE.voxel_downsample(pts, 0.2)
    assert len(vd) <= 6 ** 3
    rd = GE.radius_downsample(pts, 0.2)
    # no two kept points closer than the radius
    d = GE.nn_distances(rd, rd)  # self-distance 0; use tree with k=2 instead
    from scipy.spatial import cKDTree
    dd, _ = cKDTree(rd).query(rd, k=2)
    assert dd[:, 1].min() >= 0.2 - 1e-9


def test_f1_identical_mesh_is_perfect():
    verts, faces = sphere_mesh()
    gt_pts = GE.sample_points_on_mesh(verts, faces, 0.05)
    m = GE.tnt_f1(verts, faces, gt_pts, threshold=0.05, down_sample=0.02)
    # pred side uses mesh vertices only (eval_tnt.py semantics); a coarse
    # grid mesh has vertex spacing near the threshold -> recall ~0.96
    assert m["F-score"] > 0.95
    assert m["Acc"] < 0.01 and m["Comp"] < 0.03


def test_f1_detects_scale_error():
    verts, faces = sphere_mesh()
    gt_pts = GE.sample_points_on_mesh(verts, faces, 0.05)
    bad = GE.tnt_f1(verts * 1.3, faces, gt_pts, threshold=0.05,
                    down_sample=0.02, crop_to_gt_obb=False)
    good = GE.tnt_f1(verts, faces, gt_pts, threshold=0.05, down_sample=0.02)
    assert bad["F-score"] < good["F-score"] - 0.3


def test_icp_recovers_rigid_offset():
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 3))
    ang = 0.1
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    moved = pts @ R.T + np.array([0.05, -0.03, 0.02])
    T = GE.icp_refine(pts, moved, iters=30)
    back = pts @ T[:3, :3].T + T[:3, 3]
    assert np.abs(back - moved).max() < 1e-3


def test_dtu_chamfer_shifted_cloud():
    rng = np.random.default_rng(2)
    stl = rng.random((4000, 3)) * 10
    data = stl + 0.5 * np.array([1, 0, 0])
    m = GE.dtu_chamfer(data, stl, downsample_density=0.2, max_dist=20)
    assert 0.3 < m["mean_d2s"] < 0.6
    assert 0.3 < m["overall"] < 0.6
    perfect = GE.dtu_chamfer(stl, stl, downsample_density=0.2)
    assert perfect["overall"] < 0.15


def test_pca_obb_crop():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(3000, 3)) * np.array([3.0, 1.0, 0.2])
    R, t = GE.pca_obb(pts)
    aligned = pts @ R.T + t
    ext = aligned.max(0) - aligned.min(0)
    assert ext[0] < ext[1] < ext[2] or ext.argmax() == np.abs(
        aligned).max(0).argmax()  # principal axes sorted by eigh (asc)
    # box is centered
    np.testing.assert_allclose((aligned.max(0) + aligned.min(0)) / 2, 0,
                               atol=1e-6)


def test_nvs_metrics(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.random((3, 32, 32)).astype(np.float32)
    assert nvs.psnr(img, img) > 100
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    p = nvs.psnr(noisy, img)
    assert 15 < p < 25
    assert nvs.lpips(img, img) is None   # gated without weights
