#!/usr/bin/env python
"""Mip-NeRF 360 pipeline (reference python_scripts/run_mipnerf360.py):
train -> render train/test sets -> PSNR/SSIM metrics (NVS protocol).

  python scripts/run_mipnerf360.py --data_root data/360_v2 --out output/360 \\
      [--scenes garden bicycle] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = ["bicycle", "bonsai", "counter", "garden", "kitchen", "room",
          "stump", "flowers", "treehill"]


def sh(cmd, dry):
    print("+", " ".join(cmd), flush=True)
    if not dry:
        subprocess.run(cmd, check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out", default="output/360")
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    py = sys.executable
    results = {}
    for scene in args.scenes:
        logdir = os.path.join(args.out, scene)
        src = os.path.join(args.data_root, scene)
        train_cmd = [py, "train.py", "--config=configs/360_v2/base.yaml",
                     f"--model.source_path={src}", f"--logdir={logdir}",
                     "--model.eval"]
        if args.iterations:
            train_cmd.append(f"--optim.iterations={args.iterations}")
        sh(train_cmd, args.dry)
        sh([py, "render_eval.py", f"--cfg_path={logdir}/config.yaml",
            "--skip_train"], args.dry)
        rj = os.path.join(logdir, "test")
        if os.path.isdir(rj):
            runs = sorted(os.listdir(rj))
            if runs:
                with open(os.path.join(rj, runs[-1], "results.json")) as f:
                    results[scene] = json.load(f)
    if results:
        print(json.dumps({
            "per_scene": results,
            "mean_psnr": sum(r["PSNR"] for r in results.values())
            / len(results)}, indent=2))


if __name__ == "__main__":
    main()
