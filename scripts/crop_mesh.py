#!/usr/bin/env python
"""Crop a reconstructed mesh to the GT's oriented bounding box and export
`*_crop.ply` (reference tools/crop_mesh.py + evaluation/crop_mesh.py).

  python scripts/crop_mesh.py --ply_path out/Barn/ours.ply \\
      --gt_path data/tnt_gt/Barn/Barn.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply_path", required=True)
    ap.add_argument("--gt_path", required=True)
    ap.add_argument("--margin", type=float, default=0.0)
    args = ap.parse_args()

    from vcr_gaus_tpu.evaluation.geometry import pca_obb
    from vcr_gaus_tpu.meshing.extract import load_mesh_ply, save_mesh_ply

    verts, faces = load_mesh_ply(args.ply_path)
    gt_verts, _ = load_mesh_ply(args.gt_path)
    R, t = pca_obb(gt_verts)
    gt_aligned = gt_verts @ R.T + t
    lo = gt_aligned.min(0) - args.margin
    hi = gt_aligned.max(0) + args.margin
    aligned = verts @ R.T + t
    keep = np.all((aligned > lo) & (aligned < hi), axis=1)
    fkeep = keep[faces].all(axis=1)
    remap = np.full(len(verts), -1, np.int64)
    remap[keep] = np.arange(keep.sum())
    out = args.ply_path.replace(".ply", "_crop.ply")
    save_mesh_ply(out, verts[keep], remap[faces[fkeep]].astype(np.int32))
    print(f"wrote {out}: {int(keep.sum())}/{len(verts)} verts kept")


if __name__ == "__main__":
    main()
