"""Official TNT protocol pieces: log parsing, Umeyama, polygon crop, e2e."""

import numpy as np
import pytest

from vcr_gaus_tpu.evaluation import tnt_official as TO


def test_trajectory_log_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mats = []
    lines = []
    for i in range(5):
        m = np.eye(4)
        m[:3, 3] = rng.normal(size=3)
        mats.append(m)
        lines.append(f"{i} {i} 0")
        for r in range(4):
            lines.append(" ".join(f"{v:.8f}" for v in m[r]))
    p = tmp_path / "traj.log"
    p.write_text("\n".join(lines))
    out = TO.read_trajectory_log(str(p))
    np.testing.assert_allclose(out, np.stack(mats), atol=1e-7)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(50, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    dst = 2.5 * src @ R.T + np.array([1, -2, 3])
    T = TO.umeyama(src, dst)
    back = src @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(back, dst, atol=1e-8)


def test_polygon_crop():
    crop = {"orthogonal_axis": "Z", "axis_min": -1.0, "axis_max": 1.0,
            "bounding_polygon": [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]]}
    pts = np.array([[1, 1, 0], [3, 1, 0], [1, 1, 2], [0.5, 1.5, -0.5]])
    keep = TO.crop_polygon_volume(pts, crop)
    np.testing.assert_array_equal(keep, [True, False, False, True])


def test_golden_precision_recall_exact(tmp_path):
    """Analytically-known P/R/F1 (VERDICT r3 #4): a grid of GT points with
    spacing 4*tau (each point alone in its tau/2 voxel, so the centroid
    downsample is the identity); pred displaces a known 25% of them by
    2*tau. Displaced pred points sit 2*tau from their own GT point and
    >= 2*tau from every other, so exactly they fail the tau test in BOTH
    directions: precision = recall = F1 = 0.75 bit-exactly."""
    from vcr_gaus_tpu.meshing.extract import save_mesh_ply

    tau = 0.02
    xs = np.arange(8) * 4 * tau
    gx, gy, gz = np.meshgrid(xs, xs, xs[:2], indexing="ij")
    gt_pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)  # 128 points
    pred = gt_pts.copy()
    n_moved = len(pred) // 4
    pred[:n_moved, 2] += 2 * tau
    faces = np.zeros((1, 3), np.int32)  # degenerate face; verts carry it
    save_mesh_ply(str(tmp_path / "pred.ply"), pred, faces)
    save_mesh_ply(str(tmp_path / "gt.ply"), gt_pts, faces)

    m = TO.evaluate_tnt_scene(str(tmp_path / "pred.ply"),
                              str(tmp_path / "gt.ply"),
                              tau=tau, icp_stages=0)
    assert m["n_pred"] == len(pred) and m["n_gt"] == len(gt_pts), m
    assert m["precision"] == 0.75, m
    assert m["recall"] == 0.75, m
    np.testing.assert_allclose(m["f1"], 0.75, rtol=1e-12)


def test_ransac_umeyama_rejects_outlier_cameras():
    """Umeyama over all pairs is wrecked by a few gross outlier cameras
    (failed SfM registrations — the reason upstream uses RANSAC,
    registration.py:66+); ransac_umeyama recovers the clean transform."""
    rng = np.random.default_rng(3)
    src = rng.normal(size=(24, 3)) * 2
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    dst = 1.5 * src @ R.T + np.array([0.5, -1.0, 2.0])
    src_bad = src.copy()
    src_bad[:4] += rng.normal(size=(4, 3)) * 25.0  # gross outliers

    T_plain = TO.umeyama(src_bad, dst)
    T_ransac = TO.ransac_umeyama(src_bad, dst, thresh=0.2)
    err_plain = np.linalg.norm(
        src[4:] @ T_plain[:3, :3].T + T_plain[:3, 3] - dst[4:], axis=1)
    err_ransac = np.linalg.norm(
        src[4:] @ T_ransac[:3, :3].T + T_ransac[:3, 3] - dst[4:], axis=1)
    assert err_ransac.max() < 1e-6, err_ransac.max()
    assert err_plain.max() > 0.5, err_plain.max()


def test_end_to_end_with_outlier_trajectory(tmp_path):
    """Full protocol with 3 corrupted est-trajectory cameras: the RANSAC
    alignment must still land the mesh within ICP's capture range."""
    import sys
    sys.path.insert(0, "tests")
    from test_evaluation import sphere_mesh
    from vcr_gaus_tpu.meshing.extract import save_mesh_ply
    verts, faces = sphere_mesh(r=1.0, n=32)

    ang = 0.15
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    off = np.array([0.2, -0.1, 0.05])
    moved = verts @ R.T + off
    save_mesh_ply(str(tmp_path / "pred.ply"), moved, faces)
    save_mesh_ply(str(tmp_path / "gt.ply"), verts, faces)

    rng = np.random.default_rng(4)
    centers = rng.normal(size=(16, 3)) * 3
    lines_gt, lines_est = [], []
    for i, c in enumerate(centers):
        m_gt = np.eye(4)
        m_gt[:3, 3] = c
        m_est = np.eye(4)
        m_est[:3, 3] = c @ R.T + off
        if i < 3:  # corrupted SfM registrations
            m_est[:3, 3] += rng.normal(size=3) * 40.0
        for lines, m in ((lines_gt, m_gt), (lines_est, m_est)):
            lines.append(f"{i} {i} 0")
            for r in range(4):
                lines.append(" ".join(map(str, m[r])))
    (tmp_path / "gt.log").write_text("\n".join(lines_gt))
    (tmp_path / "est.log").write_text("\n".join(lines_est))

    m = TO.evaluate_tnt_scene(str(tmp_path / "pred.ply"),
                              str(tmp_path / "gt.ply"), tau=0.02,
                              traj_est_log=str(tmp_path / "est.log"),
                              traj_gt_log=str(tmp_path / "gt.log"))
    assert m["f1"] > 0.9, m


def test_end_to_end_alignment_and_f1(tmp_path):
    """A rigidly misaligned copy of a sphere mesh scores high F1 after the
    protocol's alignment + ICP, low without."""
    import sys
    sys.path.insert(0, "tests")
    from test_evaluation import sphere_mesh
    from vcr_gaus_tpu.meshing.extract import save_mesh_ply
    verts, faces = sphere_mesh(r=1.0, n=32)

    ang = 0.15
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    moved = verts @ R.T + np.array([0.2, -0.1, 0.05])
    pred = tmp_path / "pred.ply"
    gt = tmp_path / "gt.ply"
    save_mesh_ply(str(pred), moved, faces)
    save_mesh_ply(str(gt), verts, faces)

    # camera trajectories related by the same transform
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(12, 3)) * 3
    lines_gt, lines_est = [], []
    for i, c in enumerate(centers):
        m_gt = np.eye(4)
        m_gt[:3, 3] = c
        m_est = np.eye(4)
        # est trajectory lives in the same (misaligned) frame as the mesh
        m_est[:3, 3] = c @ R.T + np.array([0.2, -0.1, 0.05])
        for lines, m in ((lines_gt, m_gt), (lines_est, m_est)):
            lines.append(f"{i} {i} 0")
            for r in range(4):
                lines.append(" ".join(map(str, m[r])))
    (tmp_path / "gt.log").write_text("\n".join(lines_gt))
    (tmp_path / "est.log").write_text("\n".join(lines_est))

    m = TO.evaluate_tnt_scene(str(pred), str(gt), tau=0.02,
                              traj_est_log=str(tmp_path / "est.log"),
                              traj_gt_log=str(tmp_path / "gt.log"))
    assert m["f1"] > 0.9, m
    # without alignment the same offset fails
    m0 = TO.evaluate_tnt_scene(str(pred), str(gt), tau=0.02, icp_stages=0)
    assert m0["f1"] < m["f1"]
