"""Official Tanks & Temples evaluation protocol, scipy/numpy implementation.

Mirrors evaluation/tnt_eval/ (run.py + registration.py + evaluation.py):
  1. read the estimated COLMAP trajectory (.log) and the GT trajectory,
  2. rough alignment: RANSAC over index-matched camera centers (minimal
     Umeyama hypotheses + inlier refit — upstream uses open3d
     registration_ransac_based_on_correspondence with [[i,i]] pairs and
     max_corr 0.2, registration.py:66+), composed with the dataset's
     {scene}_trans.txt,
  3. crop both clouds to the scene's SelectionPolygonVolume json,
  4. refine with multi-stage ICP at decreasing correspondence radii
     (run.py:106-110's 3-stage refinement),
  5. voxel-downsample at tau/2 and compute precision/recall/F1 at tau
     (evaluation.py:60-205's EvaluateHisto).

The upstream toolbox requires open3d==0.10; this implementation has no
dependency beyond scipy and reads the same input artifacts.
"""

from __future__ import annotations

import json

import numpy as np

from ..meshing.extract import load_mesh_ply
from .geometry import icp_refine, nn_distances, voxel_downsample


def read_trajectory_log(path: str) -> np.ndarray:
    """Read a TNT/Redwood .log trajectory: blocks of 'i j k' + 4x4 matrix.
    Returns (N, 4, 4) camera-to-world poses."""
    mats = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i + 4 < len(lines) + 1:
        if i + 5 > len(lines):
            break
        rows = [list(map(float, lines[i + 1 + r].split())) for r in range(4)]
        mats.append(np.asarray(rows))
        i += 5
    return np.stack(mats)


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Closed-form similarity transform aligning src -> dst (Umeyama 1991).
    Returns 4x4."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (sc ** 2).sum() / len(src)
        c = np.trace(np.diag(D) @ S) / var
    else:
        c = 1.0
    t = mu_d - c * R @ mu_s
    T = np.eye(4)
    T[:3, :3] = c * R
    T[:3, 3] = t
    return T


def ransac_umeyama(src: np.ndarray, dst: np.ndarray, thresh: float = 0.2,
                   iters: int = 2000, seed: int = 0) -> np.ndarray:
    """RANSAC-robust similarity alignment over index-matched correspondences.

    The upstream toolbox (tnt_eval/registration.py:66+) registers camera
    centers with open3d's registration_ransac_based_on_correspondence using
    the identity correspondence list [[i, i]] and max_correspondence_distance
    0.2 — i.e. the correspondences are trusted pairwise but individual
    cameras may be gross outliers (failed SfM registrations). Plain Umeyama
    over all pairs has no such robustness; this wraps it: minimal 3-point
    hypotheses, inlier count at ``thresh``, final Umeyama refit on the best
    inlier set. Deterministic for a given seed.
    """
    n = len(src)
    if n < 4:
        return umeyama(src, dst)
    rng = np.random.default_rng(seed)
    best_inl, best_count = None, -1
    for _ in range(iters):
        idx = rng.choice(n, 3, replace=False)
        try:
            T = umeyama(src[idx], dst[idx])
        except np.linalg.LinAlgError:  # degenerate minimal set
            continue
        res = np.linalg.norm(src @ T[:3, :3].T + T[:3, 3] - dst, axis=1)
        inl = res < thresh
        c = int(inl.sum())
        if c > best_count:
            best_count, best_inl = c, inl
    if best_count < 3:
        return umeyama(src, dst)
    return umeyama(src[best_inl], dst[best_inl])


def crop_polygon_volume(points: np.ndarray, crop: dict) -> np.ndarray:
    """Keep-mask for an open3d SelectionPolygonVolume json: a polygon in the
    plane orthogonal to ``orthogonal_axis`` plus [axis_min, axis_max]."""
    axis = {"X": 0, "Y": 1, "Z": 2}[crop["orthogonal_axis"].upper()]
    lo, hi = float(crop["axis_min"]), float(crop["axis_max"])
    poly = np.asarray(crop["bounding_polygon"])
    other = [a for a in range(3) if a != axis]
    px, py = points[:, other[0]], points[:, other[1]]
    vx, vy = poly[:, other[0]], poly[:, other[1]]
    # even-odd ray casting
    inside = np.zeros(len(points), bool)
    j = len(poly) - 1
    for i in range(len(poly)):
        cond = ((vy[i] > py) != (vy[j] > py)) & (
            px < (vx[j] - vx[i]) * (py - vy[i])
            / (vy[j] - vy[i] + 1e-12) + vx[i])
        inside ^= cond
        j = i
    return inside & (points[:, axis] >= lo) & (points[:, axis] <= hi)


def evaluate_tnt_scene(
    pred_ply: str,
    gt_ply: str,
    tau: float,
    traj_est_log: str | None = None,
    traj_gt_log: str | None = None,
    trans_txt: str | None = None,
    crop_json: str | None = None,
    icp_stages: int = 3,
    seed: int = 0,
    ransac_thresh: float = 0.2,
) -> dict:
    """Full protocol; alignment inputs are optional (skipped when absent,
    e.g. for reconstructions already in GT coordinates)."""
    verts, faces = load_mesh_ply(pred_ply)
    gt_pts, _ = load_mesh_ply(gt_ply)

    T = np.eye(4)
    if trans_txt is not None:
        T = np.loadtxt(trans_txt).reshape(4, 4)
    if traj_est_log is not None and traj_gt_log is not None:
        est = read_trajectory_log(traj_est_log)
        gt = read_trajectory_log(traj_gt_log)
        n = min(len(est), len(gt))
        centers_est = est[:n, :3, 3]
        # apply the dataset pre-alignment to est centers first
        hom = np.concatenate([centers_est, np.ones((n, 1))], 1)
        centers_est = (hom @ T.T)[:, :3]
        T = ransac_umeyama(centers_est, gt[:n, :3, 3],
                           thresh=ransac_thresh, seed=seed) @ T

    hom = np.concatenate([verts, np.ones((len(verts), 1))], 1)
    pred = (hom @ T.T)[:, :3]

    crop = None
    if crop_json is not None:
        with open(crop_json) as f:
            crop = json.load(f)
        pred = pred[crop_polygon_volume(pred, crop)]
        gt_pts = gt_pts[crop_polygon_volume(gt_pts, crop)]

    # multi-stage ICP refinement at decreasing radii (run.py:106-110)
    if len(pred) > 100 and len(gt_pts) > 100:
        for stage in range(icp_stages):
            radius = tau * (20 / (2 ** stage))
            ds = max(tau, radius / 20)
            T_icp = icp_refine(voxel_downsample(pred, ds),
                               voxel_downsample(gt_pts, ds),
                               iters=15, max_corr=radius)
            pred = pred @ T_icp[:3, :3].T + T_icp[:3, 3]

    p = voxel_downsample(pred, tau / 2)
    g = voxel_downsample(gt_pts, tau / 2)
    d_p2g = nn_distances(p, g)
    d_g2p = nn_distances(g, p)
    precision = float((d_p2g < tau).mean()) if len(p) else 0.0
    recall = float((d_g2p < tau).mean()) if len(g) else 0.0
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tau": tau, "n_pred": len(p), "n_gt": len(g)}
