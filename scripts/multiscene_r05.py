#!/usr/bin/env python
"""8-scene in-process scene-DP perf artifact (VERDICT r4 next #8):
generate 8 tiny COLMAP scenes, train them CONCURRENTLY inside one
subprocess over an 8-device virtual CPU mesh (run_scannetpp.py
--in_process 8, dp.scene_dispatch — the TPU-native analog of the
reference's one-scene-per-GPU pool, python_scripts/run_base.py:13-43),
then chain the mesh/eval stages per scene. Records aggregate train
iters/sec + per-scene gates as MULTISCENE_r05.json.

Honesty note baked into the artifact: this host has ONE physical core, so
the 8 concurrent interpret-mode trainers time-share it — the aggregate
it/s validates the dispatch/isolation machinery, not chip-level scaling
(real scaling evidence is the per-chip scene pool on hardware, and
MULTICHIP_r0N's camera-DP shard_map gate).

  python scripts/multiscene_r05.py   (CPU only; safe alongside chip jobs)
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_SCENES = 8
ITERS = 50
WIDTH, HEIGHT = 64, 48


def main():
    import shutil

    from fixtures import cpu_subprocess_env, write_colmap_scene

    work = "/tmp/vcr_multiscene"
    shutil.rmtree(work, ignore_errors=True)
    data_root = os.path.join(work, "data")
    out_root = os.path.join(work, "out")
    for i in range(N_SCENES):
        write_colmap_scene(os.path.join(data_root, f"scene{i}"), n_cams=6,
                           n_pts=300, width=WIDTH, height=HEIGHT,
                           with_priors=True)

    env = cpu_subprocess_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_scannetpp.py"),
         "--data_root", data_root, "--out", out_root,
         "--in_process", "8", "--iterations", str(ITERS),
         "--voxel_size", "0.08",
         "--tpu.capacity=1024", "--model.depth_type=traditional",
         "--model.llffhold=3",
         "--optim.densify_from_iter=1000", "--train.test_iterations=[]",
         f"--train.save_iterations=[{ITERS}]"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=7200)
    wall = time.time() - t0
    sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-2000:] + "\n")
    assert r.returncode == 0, "runner failed"

    m = re.search(r"in-process train phase: (\d+) scenes in ([\d.]+)s",
                  r.stdout)
    train_wall = float(m.group(2))
    devs = re.findall(r"trained in-process on device (\S+)", r.stdout)
    res = json.loads(r.stdout[r.stdout.rindex('{\n  "per_scene"'):])

    gates = {}
    for i in range(N_SCENES):
        s = f"scene{i}"
        ld = os.path.join(out_root, s)
        gates[s] = {
            "trained": res["ok"].get(s, False),
            "mesh": os.path.exists(os.path.join(ld, "ours.ply")),
            "psnr": res["per_scene"].get(s, {}).get("PSNR"),
        }
    agg = N_SCENES * ITERS / train_wall
    out = {
        "comment": ("8 scenes trained concurrently in ONE process over an "
                    "8-device virtual CPU mesh (dp.scene_dispatch, "
                    "run_scannetpp.py --in_process), then mesh+NVS-eval "
                    "chained per scene. Substrate: interpret-mode Pallas on "
                    "a SINGLE physical core, so aggregate it/s measures "
                    "orchestration overhead, not chip throughput."),
        "date": "2026-08-20",
        "n_scenes": N_SCENES, "iters_per_scene": ITERS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "train_wall_s": round(train_wall, 1),
        "aggregate_train_iters_per_s": round(agg, 3),
        "total_wall_s": round(wall, 1),
        "distinct_devices": sorted(set(devs)),
        "all_gates_green": all(g["trained"] and g["mesh"]
                               and (g["psnr"] or 0) > 12 for g in
                               gates.values()),
        "per_scene": gates,
        "mean_psnr": res.get("mean_psnr"),
    }
    with open(os.path.join(REPO, "MULTISCENE_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
