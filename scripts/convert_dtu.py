#!/usr/bin/env python
"""DTU preprocessing (reference process_data/convert_dtu_to_json.py:62-104):
derive each scan's meta.json from the ground-truth STL point cloud (oriented
bounding box) plus the fixed DTU train/test index split.

  python scripts/convert_dtu.py --dtu_path data/dtu [--no_split]

Layout: <dtu_path>/scanNN/images/*.png and
        <dtu_path>/Points/stl/stlNNN_total.ply (official GT points).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# held-out view indices of the standard DTU evaluation protocol
TEST_INDEXES = [8, 13, 16, 21, 26, 31, 34, 56]


def scan_meta(stl_ply: str, subsample: int = 1):
    from vcr_gaus_tpu.evaluation.geometry import pca_obb
    from vcr_gaus_tpu.utils.ply import read_points_ply

    pts = read_points_ply(stl_ply)[0][::subsample]
    R, t = pca_obb(pts)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    scale = np.abs(pts @ R.T + t).max(0) * 1.2
    return T, scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtu_path", required=True)
    ap.add_argument("--no_split", action="store_true")
    ap.add_argument("--subsample", type=int, default=10)
    args = ap.parse_args()

    for scene in sorted(os.listdir(args.dtu_path)):
        scene_path = os.path.join(args.dtu_path, scene)
        if not os.path.isdir(scene_path) or "scan" not in scene:
            continue
        sid = int(scene[4:])
        stl = os.path.join(args.dtu_path, "Points", "stl",
                           f"stl{sid:03}_total.ply")
        if not os.path.exists(stl):
            print(f"[skip] {scene}: no GT points at {stl}")
            continue
        T, scale = scan_meta(stl, args.subsample)
        out = {"trans": T.tolist(), "scale": scale.tolist()}

        if not args.no_split:
            names = sorted(n for n in
                           os.listdir(os.path.join(scene_path, "images"))
                           if n.endswith("png"))
            stems = [n.split(".")[0] for n in names]
            out["train"] = sorted(s for s in stems
                                  if int(s) not in TEST_INDEXES)
            out["test"] = sorted(s for s in stems if int(s) in TEST_INDEXES)

        with open(os.path.join(scene_path, "meta.json"), "w") as fp:
            json.dump(out, fp, indent=4)
        print(f"[meta] {scene}: scale {np.round(scale, 3).tolist()}")


if __name__ == "__main__":
    main()
