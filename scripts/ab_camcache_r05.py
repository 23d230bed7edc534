#!/usr/bin/env python
"""Time the device camera cache on REAL staged-camera training (VERDICT r4
next #1c): the r4 trainpop rehearsal ran 0.15 it/s host-bound on per-step
f32 camera uploads at 1600x1200 before _DeviceCamCache existed. This A/B
trains the SAME scene twice from scratch for a short window — cam cache ON
(2048 MB, the default) vs OFF (0 = host decode + re-upload per superstep)
— and records iters/sec including host actions plus the new _StageProf
stage split (stage_cams vs dispatch vs sync fetches).

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/ab_camcache_r05.py
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 300
SCENE_CFG = "/tmp/vcr_trainpop/run/config.yaml"


def run_one(tag, cache_mb):
    logdir = f"/tmp/vcr_camcache/{tag}"
    shutil.rmtree(logdir, ignore_errors=True)
    cmd = [sys.executable, "train.py", "--config", SCENE_CFG,
           f"--logdir={logdir}", f"--optim.iterations={ITERS}",
           f"--tpu.cam_cache_mb={cache_mb}",
           "--optim.densify_from_iter=100000",   # no geometry mutations in
           "--train.test_iterations=[]",         # the timed window
           "--train.save_iterations=[]",
           "--optim.prune.iterations=[]"]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=3600)
    wall = time.time() - t0
    sys.stderr.write(r.stdout[-1500:] + "\n" + r.stderr[-800:] + "\n")
    assert r.returncode == 0, f"{tag} failed"
    m = re.search(r"\[prof\] (\{.*\})", r.stdout)
    prof = json.loads(m.group(1)) if m else None
    # train-loop wall = the prof total (excludes scene load + compiles
    # before train() starts? no — compiles happen inside the first
    # dispatch; report both and the steady tail estimate below)
    loop_s = prof["_total_wall_s"] if prof else wall
    return {"tag": tag, "cam_cache_mb": cache_mb, "iters": ITERS,
            "proc_wall_s": round(wall, 1),
            "train_loop_s": round(loop_s, 1),
            "iters_per_s_incl_actions": round(ITERS / loop_s, 3),
            "prof": prof}


def main():
    rows = []
    # interleave to bound tunnel drift: on, off, on, off
    for p, (tag, mb) in enumerate([("on0", 2048), ("off0", 0),
                                   ("on1", 2048), ("off1", 0)]):
        rows.append(run_one(tag, mb))
        print(json.dumps({k: v for k, v in rows[-1].items()
                          if k != "prof"}), flush=True)
    out = {"date": "2026-08-20", "scene": "trainpop 1600x1200 (16 cams)",
           "iters": ITERS, "rows": rows}
    with open(os.path.join(REPO, "artifacts_r05", "ab_camcache.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("[done]")


if __name__ == "__main__":
    main()
