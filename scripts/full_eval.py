#!/usr/bin/env python
"""Full NVS evaluation driver (reference evaluation/full_eval.py): train,
render, and compute PSNR/SSIM/LPIPS over the upstream-3DGS benchmark suite
(Mip-NeRF 360 indoor/outdoor, Tanks&Temples truck/train, Deep Blending).

Unlike the reference (which shells the legacy `-s/-m` CLI), stages here go
through this framework's YAML CLI; the scene lists and the 7k/30k two-point
render protocol are kept.

  python scripts/full_eval.py --mipnerf360 <dir> --tanksandtemples <dir> \\
      --deepblending <dir> [--output_path eval] [--skip_training]
      [--skip_rendering] [--skip_metrics] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

M360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
M360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TNT = ["truck", "train"]
DB = ["drjohnson", "playroom"]


def scene_jobs(args):
    """(scene, source_dir, config, resolution) per benchmark scene."""
    jobs = []
    for s in M360_OUTDOOR:
        jobs.append((s, os.path.join(args.mipnerf360, s),
                     "configs/360_v2/base.yaml", 4))
    for s in M360_INDOOR:
        jobs.append((s, os.path.join(args.mipnerf360, s),
                     "configs/360_v2/base.yaml", 2))
    for s in TNT:
        jobs.append((s, os.path.join(args.tanksandtemples, s),
                     "configs/tnt/base.yaml", -1))
    for s in DB:
        jobs.append((s, os.path.join(args.deepblending, s),
                     "configs/reconstruct.yaml", -1))
    return jobs


def run(cmd, dry, failures=None):
    print("+", " ".join(cmd), flush=True)
    if dry:
        return 0
    rc = subprocess.run(cmd, cwd=REPO).returncode
    if rc != 0:
        print(f"!! stage failed rc={rc}: {' '.join(cmd)}", flush=True)
        if failures is not None:
            failures.append({"cmd": cmd, "returncode": rc})
    return rc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_training", action="store_true")
    ap.add_argument("--skip_rendering", action="store_true")
    ap.add_argument("--skip_metrics", action="store_true")
    ap.add_argument("--output_path", default="./eval")
    ap.add_argument("--mipnerf360", "-m360", default="")
    ap.add_argument("--tanksandtemples", "-tat", default="")
    ap.add_argument("--deepblending", "-db", default="")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args(argv)

    if not (args.skip_training and args.skip_rendering):
        for flag in ("mipnerf360", "tanksandtemples", "deepblending"):
            if not getattr(args, flag):
                ap.error(f"--{flag} is required unless both training and "
                         "rendering are skipped")
    py = sys.executable
    jobs = scene_jobs(args)
    failures: list = []

    if not args.skip_training:
        for scene, src, config, res in jobs:
            logdir = os.path.join(args.output_path, scene)
            cmd = [py, "train.py", f"--config={config}",
                   f"--model.source_path={src}", f"--logdir={logdir}",
                   "--model.eval"]
            if res > 0:
                cmd.append(f"--model.resolution={res}")
            run(cmd, args.dry, failures)

    if not args.skip_rendering:
        for scene, _, _, _ in jobs:
            logdir = os.path.join(args.output_path, scene)
            for iteration in (7000, 30000):
                run([py, "render_eval.py",
                     f"--cfg_path={logdir}/config.yaml",
                     f"--iteration={iteration}", "--skip_train"],
                    args.dry, failures)

    if not args.skip_metrics and not args.dry:
        results = {}
        for scene, _, _, _ in jobs:
            path = os.path.join(args.output_path, scene, "results.json")
            if os.path.isfile(path):
                with open(path) as f:
                    results[scene] = json.load(f)
        print(json.dumps(results, indent=2))

    if failures:
        print(f"!! {len(failures)} stage(s) failed:", flush=True)
        for f in failures:
            print(f"   rc={f['returncode']}: {' '.join(f['cmd'])}",
                  flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
