"""DTU mesh culling by image masks + camera frusta
(evaluation/eval_dtu/evaluate_single_scene.py:22-111).

A vertex survives if, in EVERY view, it projects inside the (24px-dilated)
object mask or outside the frustum; the mesh is then rescaled to GT world
via scale_mat and reduced to its largest connected component.
"""

from __future__ import annotations

import glob
import os

import numpy as np


def load_k_rt_from_p(P: np.ndarray):
    """Decompose a 3x4 projection into (K (4,4), c2w pose (4,4)) — the
    reference's rend_util.load_K_Rt_from_P (RQ decomposition via cv2)."""
    import cv2
    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def _dilate(mask: np.ndarray, radius: int = 24) -> np.ndarray:
    import cv2
    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    return cv2.dilate(mask.astype(np.uint8), kernel) > 0


def cull_mesh_dtu(verts: np.ndarray, faces: np.ndarray, instance_dir: str,
                  width: int = 1600, height: int = 1200,
                  dilate_radius: int = 24):
    """Returns (culled verts in GT world units, culled faces)."""
    cam = np.load(os.path.join(instance_dir, "cameras.npz"))
    mask_paths = sorted(glob.glob(os.path.join(instance_dir, "mask",
                                               "*.png")))
    n = len(mask_paths)
    import cv2
    keep = np.ones(len(verts), bool)
    hom = np.concatenate([verts, np.ones((len(verts), 1))], 1)
    for i in range(n):
        P = (cam[f"world_mat_{i}"] @ cam[f"scale_mat_{i}"])[:3, :4]
        intr, pose = load_k_rt_from_p(P)
        w2c = np.linalg.inv(pose)
        pts_cam = hom @ (intr[:3, :3] @ w2c[:3]).T          # (V, 3)
        z = pts_cam[:, 2:3] + 1e-6
        uv = pts_cam[:, :2] / z
        in_frustum = ((uv[:, 0] >= 0) & (uv[:, 0] <= width - 1)
                      & (uv[:, 1] >= 0) & (uv[:, 1] <= height - 1)
                      & (z[:, 0] > 0))
        m = cv2.imread(mask_paths[i])[:, :, 0] > 127
        m = _dilate(m, dilate_radius)
        ui = np.clip(np.round(uv[:, 0]).astype(int), 0, width - 1)
        vi = np.clip(np.round(uv[:, 1]).astype(int), 0, height - 1)
        in_mask = m[vi, ui]
        # survive this view if inside its dilated mask OR outside its frustum
        keep &= in_mask | ~in_frustum

    vmask = keep
    fmask = vmask[faces].all(axis=1)
    remap = np.full(len(verts), -1, np.int64)
    remap[vmask] = np.arange(vmask.sum())
    verts_c = verts[vmask]
    faces_c = remap[faces[fmask]].astype(np.int32)

    # to GT world units
    s = cam["scale_mat_0"]
    verts_c = verts_c * s[0, 0] + s[:3, 3][None]

    from ..meshing.marching import keep_largest_components
    return keep_largest_components(verts_c, faces_c, n_keep=1)
