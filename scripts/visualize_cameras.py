#!/usr/bin/env python
"""Camera-pose / scene-layout visualization (reference tools/visualize.py +
tools/camera.py k3d/plotly notebook helpers, re-targeted to matplotlib since
the image ships no k3d/plotly): renders camera frusta, the sparse point
cloud and the meta.json box to a PNG.

  python scripts/visualize_cameras.py --source data/scene [--out poses.png]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def frustum_lines(c2w: np.ndarray, scale: float = 0.3):
    """5 corner points of a pyramid frustum in world space -> line segments."""
    corners = np.array([
        [0, 0, 0], [-0.5, -0.375, 1], [0.5, -0.375, 1],
        [0.5, 0.375, 1], [-0.5, 0.375, 1]]) * scale
    pts = corners @ c2w[:3, :3].T + c2w[:3, 3]
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[a], pts[b]) for a, b in edges]


def box_lines(trans: np.ndarray, scale: np.ndarray):
    """Edges of the meta.json oriented box (|p_box| <= scale)."""
    T = np.asarray(trans)
    s = np.asarray(scale)
    if T.ndim == 1:                     # translation-only box
        R, t = np.eye(3), T
    else:
        R, t = T[:3, :3], T[:3, 3]
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)]) * s
    world = (corners - t) @ np.linalg.inv(R).T if T.ndim > 1 else corners + t
    # box-space -> world: p_world = R^-1 (p_box - t)
    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)
             if bin(a ^ b).count("1") == 1]
    return [(world[a], world[b]) for a, b in edges]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max_points", type=int, default=20000)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vcr_gaus_tpu.utils import colmap as CM

    for sub in ("sparse/0", "sparse"):
        d = os.path.join(args.source, sub)
        if os.path.exists(os.path.join(d, "images.bin")):
            images = CM.read_images_binary(os.path.join(d, "images.bin"))
            xyz, rgb, _ = CM.read_points3d_binary(
                os.path.join(d, "points3D.bin"))
            break
        if os.path.exists(os.path.join(d, "images.txt")):
            images = CM.read_images_text(os.path.join(d, "images.txt"))
            xyz, rgb = np.zeros((0, 3)), np.zeros((0, 3))
            break
    else:
        raise SystemExit("no COLMAP sparse model found")

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="3d")
    if len(xyz):
        sel = np.random.default_rng(0).choice(
            len(xyz), min(args.max_points, len(xyz)), replace=False)
        ax.scatter(*xyz[sel].T, s=0.3, c=np.clip(rgb[sel] / 255.0, 0, 1))

    centers = []
    for img in images.values():
        R = CM.qvec_to_rotmat(img.qvec)
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ img.tvec
        centers.append(c2w[:3, 3])
        for a, b in frustum_lines(c2w):
            ax.plot(*zip(a, b), color="tab:blue", lw=0.6)
    centers = np.array(centers)

    meta_path = os.path.join(args.source, "meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        for a, b in box_lines(np.asarray(meta["trans"]),
                              np.asarray(meta["scale"])):
            ax.plot(*zip(a, b), color="tab:red", lw=1.0)

    ax.set_title(f"{os.path.basename(args.source)}: "
                 f"{len(images)} cams, {len(xyz)} points")
    lim = np.abs(centers).max() * 1.2 if len(centers) else 1.0
    for setter in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        setter(-lim, lim)
    out = args.out or os.path.join(args.source, "poses.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
