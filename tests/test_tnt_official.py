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
