#!/usr/bin/env python
"""Tanks & Temples pipeline (reference python_scripts/run_tnt.py): per scene,
train -> mesh with the voxel-size retry ladder -> F1 eval; aggregate.

  python scripts/run_tnt.py --data_root data/tnt --gt_root data/tnt_gt \\
      --out output/tnt [--scenes Barn Truck] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = ["Barn", "Caterpillar", "Courthouse", "Ignatius", "Meetingroom",
          "Truck"]
# per-scene tau (evaluation/tnt_eval/config.py:33-41)
TAU = {"Barn": 0.01, "Caterpillar": 0.005, "Courthouse": 0.025,
       "Ignatius": 0.003, "Meetingroom": 0.01, "Truck": 0.005}
VOXEL_LADDER = [0.002, 0.004, 0.006, 0.01, 0.02]


def sh(cmd, dry):
    print("+", " ".join(cmd), flush=True)
    if dry:
        return True
    return subprocess.run(cmd, cwd=REPO).returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--gt_root", required=True)
    ap.add_argument("--out", default="output/tnt")
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--voxel_ladder", type=float, nargs="*",
                    default=VOXEL_LADDER,
                    help="voxel sizes tried in order until meshing "
                         "succeeds (run_tnt.py:47-48,82-85)")
    ap.add_argument("--max_voxels", type=int, default=None,
                    help="forwarded to depth2mesh (grid-size abort)")
    ap.add_argument("--dry", action="store_true")
    # unrecognized dotted overrides (--a.b=c) pass through to train.py
    args, train_overrides = ap.parse_known_args()

    py = sys.executable
    results = {}
    for scene in args.scenes:
        logdir = os.path.join(args.out, scene)
        src = os.path.join(args.data_root, scene)
        scene_cfg = f"configs/tnt/{scene}.yaml"
        if not os.path.exists(os.path.join(REPO, scene_cfg)):
            scene_cfg = "configs/tnt/base.yaml"
        train_cmd = [py, "train.py", f"--config={scene_cfg}",
                     f"--model.source_path={src}", f"--logdir={logdir}"]
        if args.iterations:
            train_cmd.append(f"--optim.iterations={args.iterations}")
        train_cmd += train_overrides
        if not sh(train_cmd, args.dry):
            print(f"TRAIN FAILED: {scene}")
            continue
        # check_finish gate (reference run_base.py:46-50)
        if not args.dry and not os.path.isdir(
                os.path.join(logdir, "point_cloud")):
            print(f"check_finish FAILED: no point_cloud/ for {scene}")
            continue
        # OOM-resilience ladder (run_tnt.py:47-48,82-85): retry coarser
        ok = False
        for vs in args.voxel_ladder:
            mesh_cmd = [py, "depth2mesh.py",
                        f"--cfg_path={logdir}/config.yaml",
                        f"--voxel_size={vs}", "--split=3", "--max_depth=8",
                        "--prob_thr=0.3", "--num_cluster=0"]
            if args.max_voxels:
                mesh_cmd.append(f"--max_voxels={args.max_voxels}")
            if sh(mesh_cmd, args.dry):
                ok = True
                break
        if not ok:
            print(f"MESH FAILED: {scene}")
            continue
        sh([py, "scripts/eval_geometry.py", "tnt",
            f"--ply_path={logdir}/ours.ply",
            f"--gt_path={os.path.join(args.gt_root, scene, scene + '.ply')}",
            f"--threshold={TAU.get(scene, 0.01)}", "--icp"], args.dry)
        mt = os.path.join(logdir, "metrics.txt")
        if os.path.exists(mt):
            with open(mt) as f:
                results[scene] = {k: float(v) for k, v in
                                  (ln.split(": ") for ln in f)}
    if results:
        mean_f1 = sum(r["F-score"] for r in results.values()) / len(results)
        print(json.dumps({"per_scene": results, "mean_f1": mean_f1},
                         indent=2))


if __name__ == "__main__":
    main()
