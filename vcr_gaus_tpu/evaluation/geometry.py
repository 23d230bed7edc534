"""Geometry evaluation: Chamfer (DTU protocol) and precision/recall/F1 (TNT).

Fresh numpy/scipy implementations of the reference's evaluators:
  * DTU: evaluation/eval_dtu/eval.py:27-166 — triangle-area-proportional
    sampling, radius-graph downsample, ObsMask/bbox filtering, bidirectional
    NN distance against the STL ground truth,
  * TNT (lightweight): evaluation/eval_tnt.py:22-49 — oriented-bbox crop,
    voxel downsample, bidirectional distances, P/R/F1 at tau,
  * ICP refinement used by the official TNT toolbox (tnt_eval/run.py:106-110)
    as a scipy Kabsch + cKDTree loop.

open3d/trimesh are not available in this image; their primitives
(voxel_down_sample, oriented_bounds, KDTree queries) are reimplemented here.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


# ---------------------------------------------------------------------------
# mesh/point-cloud primitives
# ---------------------------------------------------------------------------

def sample_points_on_mesh(verts: np.ndarray, faces: np.ndarray,
                          density_thresh: float, seed: int = 0) -> np.ndarray:
    """Reference-exact deterministic barycentric-grid sampling
    (eval_dtu/eval.py:10-19,55-68, the DTUeval-python scheme): per triangle
    with edge vectors v1 = B-A, v2 = C-A (lengths l1, l2, parallelogram
    area area2 = |v1 x v2|), grid pitch thr = thresh * sqrt(l1*l2/area2);
    the (n1+1)x(n2+1) cell-center grid (u, v) = ((i+.5)/n1, (j+.5)/n2)
    with n1 = floor(l1/thr), n2 = floor(l2/thr) keeps u+v < 1 and emits
    q = A + u*v1 + v*v2 (~area/thresh^2 samples per triangle; a triangle
    with an edge shorter than thr gets no interior samples — n=0 maps to
    u = 0.5/1e-7, dropped by the u+v < 1 cut, exactly as upstream).
    Zero-area triangles are filtered first (eval.py:60-63). The mesh
    vertices themselves are always included. ``seed`` is accepted for
    call-site compatibility; the grid is deterministic."""
    A = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]] - A
    v2 = verts[faces[:, 2]] - A
    l1 = np.linalg.norm(v1, axis=1)
    l2 = np.linalg.norm(v2, axis=1)
    area2 = np.linalg.norm(np.cross(v1, v2), axis=1)
    nz = area2 > 0
    A, v1, v2, l1, l2, area2 = (x[nz] for x in (A, v1, v2, l1, l2, area2))
    if len(A) == 0:
        return verts.copy()
    thr = density_thresh * np.sqrt(l1 * l2 / area2)
    n1 = np.floor(l1 / thr)
    n2 = np.floor(l2 / thr)
    counts = ((n1 + 1) * (n2 + 1)).astype(np.int64)
    tri = np.repeat(np.arange(len(A)), counts)
    starts = np.cumsum(counts) - counts
    local = np.arange(int(counts.sum()), dtype=np.int64) - starts[tri]
    cols = (n2[tri] + 1).astype(np.int64)
    i = local // cols
    j = local - i * cols
    u = (i + 0.5) / np.maximum(n1[tri], 1e-7)
    v = (j + 0.5) / np.maximum(n2[tri], 1e-7)
    keep = (u + v) < 1
    tri, u, v = tri[keep], u[keep], v[keep]
    pts = A[tri] + u[:, None] * v1[tri] + v[:, None] * v2[tri]
    return np.concatenate([verts, pts], axis=0)


def radius_downsample(points: np.ndarray, radius: float,
                      seed: int = 0) -> np.ndarray:
    """The DTU evaluator's shuffle + greedy radius suppression
    (eval_dtu/eval.py:80-95)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(points))
    pts = points[order]
    tree = cKDTree(pts)
    mask = np.ones(len(pts), bool)
    neighbors = tree.query_ball_point(pts, r=radius, workers=-1)
    for i, idxs in enumerate(neighbors):
        if mask[i]:
            mask[idxs] = False
            mask[i] = True
    return pts[mask]


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Centroid-per-voxel downsampling (o3d voxel_down_sample semantics)."""
    if voxel <= 0 or len(points) == 0:
        return points
    keys = np.floor((points - points.min(0)) / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((len(counts), 3))
    np.add.at(sums, inv, points)
    return sums / counts[:, None]


def nn_distances(query: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Distance from each query point to its nearest neighbor in target."""
    if len(query) == 0 or len(target) == 0:
        return np.zeros(0)
    d, _ = cKDTree(target).query(query, k=1, workers=-1)
    return d


def pca_obb(points: np.ndarray):
    """PCA oriented bounding box: returns (R (3,3), t (3,)) so that
    ``points @ R.T + t`` is axis-aligned and centered. Approximates
    trimesh.bounds.oriented_bounds (used by eval_tnt.py:57 and the
    preprocessing bbox, convert_data_to_json.py:97-102)."""
    c = points.mean(0)
    cov = np.cov((points - c).T)
    _, vecs = np.linalg.eigh(cov)
    R = vecs.T
    if np.linalg.det(R) < 0:
        R[2] *= -1
    aligned = (points - c) @ R.T
    mid = (aligned.max(0) + aligned.min(0)) / 2
    t = -(c @ R.T) - mid
    return R, t


def icp_refine(src: np.ndarray, dst: np.ndarray, iters: int = 20,
               max_corr: float | None = None):
    """Point-to-point ICP (Kabsch updates): returns a 4x4 transform mapping
    src -> dst (the official toolbox's 3-stage refinement,
    tnt_eval/run.py:106-110, collapsed to one scipy loop)."""
    T = np.eye(4)
    cur = src.copy()
    tree = cKDTree(dst)
    for _ in range(iters):
        d, idx = tree.query(cur, k=1, workers=-1)
        if max_corr is not None:
            keep = d < max_corr
            if keep.sum() < 10:
                break
        else:
            keep = np.ones(len(cur), bool)
        a = cur[keep]
        b = dst[idx[keep]]
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, _, Vt = np.linalg.svd(H)
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            Vt[2] *= -1
            R = Vt.T @ U.T
        t = cb - R @ ca
        step = np.eye(4)
        step[:3, :3] = R
        step[:3, 3] = t
        T = step @ T
        cur = cur @ R.T + t
    return T


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def tnt_f1(pred_verts, pred_faces, gt_points, threshold: float = 0.05,
           down_sample: float = 0.02, crop_to_gt_obb: bool = True,
           run_icp: bool = False) -> dict:
    """Lightweight TNT metric (evaluation/eval_tnt.py:22-49 + main crop)."""
    pred = pred_verts
    if crop_to_gt_obb and len(gt_points):
        R, t = pca_obb(gt_points)
        gt_aligned = gt_points @ R.T + t
        pred_aligned = pred @ R.T + t
        lo, hi = gt_aligned.min(0), gt_aligned.max(0)
        keep = np.all((pred_aligned > lo) & (pred_aligned < hi), axis=1)
        pred = pred[keep]
    if run_icp and len(pred) > 100:
        T = icp_refine(voxel_downsample(pred, down_sample * 2),
                       voxel_downsample(gt_points, down_sample * 2),
                       max_corr=threshold * 5)
        pred = pred @ T[:3, :3].T + T[:3, 3]
    p = voxel_downsample(pred, down_sample)
    g = voxel_downsample(gt_points, down_sample)
    dist_g2p = nn_distances(g, p)      # completeness direction
    dist_p2g = nn_distances(p, g)      # accuracy direction
    precision = float((dist_p2g < threshold).mean()) if len(p) else 0.0
    recall = float((dist_g2p < threshold).mean()) if len(g) else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"Acc": float(dist_p2g.mean()) if len(p) else np.inf,
            "Comp": float(dist_g2p.mean()) if len(g) else np.inf,
            "Prec": precision, "Recal": recall, "F-score": f1}


def dtu_chamfer(data_pcd: np.ndarray, stl_points: np.ndarray,
                downsample_density: float = 0.2, max_dist: float = 20.0,
                patch_size: float = 60.0, obs_mask=None, bb=None, res=None,
                ground_plane=None, seed: int = 0) -> dict:
    """DTU Chamfer protocol (eval_dtu/eval.py:36-166). ``data_pcd`` is the
    point sample of the culled mesh; ObsMask/BB/Res/Plane come from the DTU
    SampleSet .mat files when available (scipy.io.loadmat by the caller)."""
    data_down = radius_downsample(data_pcd, downsample_density, seed)

    data_in = data_down
    if obs_mask is not None:
        bb = bb.astype(np.float32)
        inbound = np.all((data_down >= bb[:1] - patch_size)
                         & (data_down < bb[1:] + patch_size * 2), axis=-1)
        data_in = data_down[inbound]
        grid = np.around((data_in - bb[:1]) / res).astype(np.int32)
        shape = np.asarray(obs_mask.shape)[None]
        g_in = np.all((grid >= 0) & (grid < shape), axis=-1)
        gi = grid[g_in]
        in_obs = obs_mask[gi[:, 0], gi[:, 1], gi[:, 2]].astype(bool)
        data_in_obs = data_in[g_in][in_obs]
    else:
        data_in_obs = data_in

    d2s = nn_distances(data_in_obs, stl_points)
    mean_d2s = float(d2s[d2s < max_dist].mean()) if len(d2s) else np.inf

    stl_above = stl_points
    if ground_plane is not None:
        hom = np.concatenate([stl_points,
                              np.ones_like(stl_points[:, :1])], -1)
        stl_above = stl_points[(hom @ ground_plane.reshape(4)) > 0]
    s2d = nn_distances(stl_above, data_in)
    mean_s2d = float(s2d[s2d < max_dist].mean()) if len(s2d) else np.inf
    return {"mean_d2s": mean_d2s, "mean_s2d": mean_s2d,
            "overall": (mean_d2s + mean_s2d) / 2}
