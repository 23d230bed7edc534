#!/usr/bin/env python
"""Scene-bounds preprocessing: derive meta.json {trans, scale} for a COLMAP
scene (reference process_data/convert_data_to_json.py).

  python scripts/make_meta.py --source data/scene [--mode points|pose|obb]
                              [--split_ratio 0.9]

Modes:
  points  centroid + 1.1*max|xyz| per axis from the sparse points (:80-94)
  pose    concentric-capture center/radius from camera rays (:49-77)
  obb     PCA oriented bounding box of the sparse points written as a 4x4
          transform + per-axis scale (compute_oriented_bound,
          convert_tnt_to_json.py:227-238 — PCA instead of min-volume OBB)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bound_by_pose(images):
    """Center = mean pairwise closest point of the camera optical rays;
    radius = mean camera distance (convert_data_to_json.py:49-77)."""
    from vcr_gaus_tpu.utils.colmap import qvec_to_rotmat
    poses = []
    for img in images.values():
        w2c = np.eye(4)
        w2c[:3, :3] = qvec_to_rotmat(img.qvec)
        w2c[:3, 3] = img.tvec
        poses.append(np.linalg.inv(w2c))

    def closest_point(p1, d1, p2, d2):
        n = np.cross(d1, d2)
        if np.linalg.norm(n) < 1e-9:
            return (p1 + p2) / 2
        t1 = np.dot(np.cross(p2 - p1, d2), n) / np.dot(n, n)
        t2 = np.dot(np.cross(p2 - p1, d1), n) / np.dot(n, n)
        return ((p1 + t1 * d1) + (p2 + t2 * d2)) / 2

    center = np.zeros(3)
    for f in poses:
        for g in poses:
            center += closest_point(f[:3, 3], f[:3, 2], g[:3, 3], g[:3, 2])
    center /= len(poses) ** 2
    radius = np.mean([np.linalg.norm(f[:3, 3]) for f in poses])
    return center, np.full(3, radius)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--mode", choices=["points", "pose", "obb"],
                    default="points")
    ap.add_argument("--split_ratio", type=float, default=0.0,
                    help="also write train/test name lists into meta.json")
    args = ap.parse_args()

    from vcr_gaus_tpu.data.scene import bound_by_points
    from vcr_gaus_tpu.evaluation.geometry import pca_obb
    from vcr_gaus_tpu.utils import colmap as CM

    colmap_dir = os.path.join(args.source, "sparse/0")
    if not os.path.exists(colmap_dir):
        colmap_dir = os.path.join(args.source, "sparse")

    meta = {}
    if args.mode == "pose":
        images = CM.read_images_binary(os.path.join(colmap_dir, "images.bin"))
        trans, scale = bound_by_pose(images)
        meta["trans"] = trans.tolist()
        meta["scale"] = scale.tolist()
    else:
        xyz, _, _ = (CM.read_points3d_binary(
            os.path.join(colmap_dir, "points3D.bin"))
            if os.path.exists(os.path.join(colmap_dir, "points3D.bin"))
            else CM.read_points3d_text(
                os.path.join(colmap_dir, "points3D.txt")))
        if args.mode == "points":
            trans, scale = bound_by_points(xyz)
            meta["trans"] = trans.tolist()
            meta["scale"] = scale.tolist()
        else:  # oriented box
            R, t = pca_obb(xyz)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            aligned = xyz @ R.T + t
            scale = np.abs(aligned).max(0) * 1.2
            meta["trans"] = T.tolist()
            meta["scale"] = scale.tolist()

    if args.split_ratio > 0:
        images = CM.read_images_binary(os.path.join(colmap_dir, "images.bin"))
        names = sorted(os.path.splitext(os.path.basename(i.name))[0]
                       for i in images.values())
        n_train = int(len(names) * args.split_ratio)
        hold = max(len(names) // max(len(names) - n_train, 1), 2)
        test = names[::hold][:len(names) - n_train]
        meta["train"] = [n for n in names if n not in set(test)]
        meta["test"] = test

    out = os.path.join(args.source, "meta.json")
    with open(out, "w") as f:
        json.dump(meta, f, indent=4)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
