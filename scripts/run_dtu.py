#!/usr/bin/env python
"""DTU benchmark pipeline (reference python_scripts/run_dtu.py): per scan,
train -> mesh (tsdf voxel 0.004, max_depth 3) -> Chamfer eval; aggregate.

  python scripts/run_dtu.py --data_root data/dtu --eval_dir data/dtu_eval \\
      --out output/dtu [--scans 24 37] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]


def sh(cmd, dry):
    print("+", " ".join(cmd), flush=True)
    if not dry:
        subprocess.run(cmd, check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--eval_dir", required=True)
    ap.add_argument("--out", default="output/dtu")
    ap.add_argument("--scans", type=int, nargs="*", default=SCANS)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--voxel_size", type=float, default=0.004,
                    help="TSDF voxel (reference run_dtu.py:46-53)")
    ap.add_argument("--dry", action="store_true")
    # unrecognized dotted overrides (--a.b=c) pass through to train.py
    args, train_overrides = ap.parse_known_args()

    py = sys.executable
    results = {}
    for scan in args.scans:
        logdir = os.path.join(args.out, f"scan{scan}")
        src = os.path.join(args.data_root, f"scan{scan}")
        train_cmd = [py, "train.py", "--config=configs/dtu/base.yaml",
                     f"--model.source_path={src}", f"--logdir={logdir}"]
        if args.iterations:
            train_cmd.append(f"--optim.iterations={args.iterations}")
        train_cmd += train_overrides
        sh(train_cmd, args.dry)
        # check_finish gate (reference run_base.py:46-50)
        if not args.dry and not os.path.isdir(
                os.path.join(logdir, "point_cloud")):
            raise SystemExit(f"check_finish: no point_cloud/ for scan{scan}")
        sh([py, "depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
            f"--voxel_size={args.voxel_size}", "--max_depth=3",
            "--prob_thr=0.15", "--num_cluster=1"], args.dry)
        sh([py, "scripts/eval_geometry.py", "dtu",
            f"--ply_path={logdir}/ours.ply",
            f"--dataset_dir={args.eval_dir}", f"--scan={scan}"], args.dry)
        rj = os.path.join(logdir, "results.json")
        if os.path.exists(rj):
            with open(rj) as f:
                results[scan] = json.load(f)
    if results:
        mean = sum(r["overall"] for r in results.values()) / len(results)
        print(json.dumps({"per_scan": results, "mean_chamfer": mean},
                         indent=2))


if __name__ == "__main__":
    main()
