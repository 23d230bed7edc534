#!/usr/bin/env python
"""Geometry metric CLIs.

TNT F1 (reference evaluation/eval_tnt.py):
  python scripts/eval_geometry.py tnt --ply_path out/Barn/ours.ply \\
      --gt_path data/tnt/Barn/Barn_GT.ply --threshold 0.01

DTU Chamfer (reference evaluation/eval_dtu/eval.py):
  python scripts/eval_geometry.py dtu --ply_path out/scan24/ours.ply \\
      --scan 24 --dataset_dir data/dtu_eval   # (Points/stl + ObsMask .mats)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmd_tnt(args):
    from vcr_gaus_tpu.evaluation.geometry import tnt_f1
    from vcr_gaus_tpu.meshing.extract import load_mesh_ply
    verts, faces = load_mesh_ply(args.ply_path)
    gt_verts, _ = load_mesh_ply(args.gt_path)
    m = tnt_f1(verts, faces, gt_verts, threshold=args.threshold,
               down_sample=args.down_sample, run_icp=args.icp)
    out = os.path.join(os.path.dirname(args.ply_path), "metrics.txt")
    with open(out, "w") as f:
        for k, v in m.items():
            f.write(f"{k}: {v}\n")
    print(json.dumps(m))


def cmd_dtu(args):
    from scipy.io import loadmat

    from vcr_gaus_tpu.evaluation.geometry import (dtu_chamfer,
                                                  sample_points_on_mesh)
    from vcr_gaus_tpu.meshing.extract import load_mesh_ply
    from vcr_gaus_tpu.utils.ply import read_points_ply
    verts, faces = load_mesh_ply(args.ply_path)
    if args.instance_dir:
        # cull by image masks + frusta (evaluate_single_scene.py protocol)
        from vcr_gaus_tpu.evaluation.dtu_cull import cull_mesh_dtu
        verts, faces = cull_mesh_dtu(verts, faces, args.instance_dir)
    pts = sample_points_on_mesh(verts, faces, args.downsample_density)
    stl, _, _ = read_points_ply(os.path.join(
        args.dataset_dir, "Points", "stl", f"stl{args.scan:03d}_total.ply"))
    obs = bb = res = plane = None
    mat = os.path.join(args.dataset_dir, "ObsMask",
                       f"ObsMask{args.scan}_10.mat")
    if os.path.exists(mat):
        m = loadmat(mat)
        obs, bb, res = m["ObsMask"], m["BB"], m["Res"]
        plane = loadmat(os.path.join(args.dataset_dir, "ObsMask",
                                     f"Plane{args.scan}.mat"))["P"]
    else:
        print("WARNING: ObsMask assets missing; unmasked chamfer", file=sys.stderr)
    m = dtu_chamfer(pts, stl, downsample_density=args.downsample_density,
                    max_dist=args.max_dist, patch_size=args.patch_size,
                    obs_mask=obs, bb=bb, res=res, ground_plane=plane)
    out = os.path.join(os.path.dirname(args.ply_path), "results.json")
    with open(out, "w") as f:
        json.dump(m, f, indent=2)
    print(json.dumps(m))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tnt")
    t.add_argument("--ply_path", required=True)
    t.add_argument("--gt_path", required=True)
    t.add_argument("--threshold", type=float, default=0.05)
    t.add_argument("--down_sample", type=float, default=0.02)
    t.add_argument("--icp", action="store_true")
    t.set_defaults(fn=cmd_tnt)
    d = sub.add_parser("dtu")
    d.add_argument("--ply_path", required=True)
    d.add_argument("--dataset_dir", required=True)
    d.add_argument("--scan", type=int, required=True)
    d.add_argument("--downsample_density", type=float, default=0.2)
    d.add_argument("--patch_size", type=float, default=60)
    d.add_argument("--max_dist", type=float, default=20)
    d.add_argument("--instance_dir", default=None,
                   help="DTU instance dir (cameras.npz + mask/) for culling")
    d.set_defaults(fn=cmd_dtu)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
