#!/usr/bin/env python
"""Full-schedule on-chip rehearsal (VERDICT r2 next #7): the BASELINE
config-#1 shape — DTU-quick protocol at quarter resolution — with EVERY host
action firing at a realistic cadence on real hardware:

  densify (interval 100) -> opacity reset (3000) -> LightGaussian prune
  (two rounds; the 15k/25k protocol iterations scaled into the 7k window)
  -> test sweeps -> save -> depth2mesh -> render_eval, with PSNR + chamfer
  gates and wall-time reported.

The 1k-iter tpu_smoke/tpu_e2e never reach a prune iteration on hardware;
this script is the schedule-coverage gate (reference schedule:
configs/config_base.yaml:40-76 + reconstruct.yaml:31-35).

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/tpu_protocol.py

~7k iterations at 400x300 (quarter of the reference's 1600-wide cap).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# The PARENT process only writes the scene (fixture oracle renders) and
# parses artifacts — pin it to CPU so it never opens the tunnel; the
# train/mesh/eval stages run in subprocesses that inherit the default
# (chip) backend. os.environ would propagate to the children, so use the
# in-process config switch instead (tests/conftest.py idiom).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    assert r.returncode == 0, f"stage failed: {cmd}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vcr_protocol")
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--full30k", action="store_true",
                    help="VERDICT r5 next #5: the UNSCALED reference "
                         "schedule — 30k iters at 800x600, densify "
                         "[500,15000] every 100, opacity reset x10, prune "
                         "at 15k/25k, LR decay over the full tail "
                         "(configs/config_base.yaml:40-76 + "
                         "reconstruct.yaml:31-35 cadence at real iteration "
                         "numbers)")
    args = ap.parse_args()

    scene = os.path.join(args.workdir, "scene")
    logdir = os.path.join(args.workdir, "run")
    shutil.rmtree(args.workdir, ignore_errors=True)

    w, h = (800, 600) if args.full30k else (400, 300)
    from fixtures import write_colmap_scene
    write_colmap_scene(scene, n_cams=16, n_pts=2000, width=w, height=h,
                       with_priors=True)
    print("scene written", flush=True)

    py = sys.executable
    it = 30000 if args.full30k else args.iters
    if args.full30k:
        sched = ["--optim.densify_from_iter=500",
                 "--optim.densify_until_iter=15000",
                 "--optim.densification_interval=100",
                 "--optim.opacity_reset_interval=3000",
                 "--optim.prune.iterations=[15000,25000]",
                 "--tpu.capacity=131072",
                 f"--train.test_iterations=[7000,{it}]"]
    else:
        # the reference cadence (config_base.yaml:40-63), window-scaled:
        # densify 500 -> 4000 every 100, opacity reset every 3000 (fires
        # at 3000), LightGaussian prune twice (the 15k/25k protocol rounds
        # mapped into the run, reconstruct.yaml:31-35)
        sched = ["--optim.densify_from_iter=500",
                 "--optim.densify_until_iter=4000",
                 "--optim.densification_interval=100",
                 "--optim.opacity_reset_interval=3000",
                 "--optim.prune.iterations=[4500,6000]",
                 "--tpu.capacity=32768",
                 f"--train.test_iterations=[3500,{it}]"]
    t0 = time.time()
    run([py, "train.py", "--config=configs/config_base.yaml",
         f"--model.source_path={scene}", f"--logdir={logdir}",
         "--model.depth_type=intersection",
         f"--optim.iterations={it}",
         *sched,
         "--optim.loss_weight.mono_normal=0.01",
         "--optim.loss_weight.depth_normal=0.015",
         "--tpu.steps_per_call=10",
         f"--train.save_iterations=[{it}]"])
    t_train = time.time() - t0
    ply = os.path.join(logdir, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    assert os.path.exists(ply), "check_finish: PLY missing"
    # both prune rounds produced the importance dump at the end
    assert os.path.exists(os.path.join(logdir, "imp_score.npz")), \
        "imp_score.npz missing (prune schedule did not run)"

    t1 = time.time()
    run([py, "depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
         "--voxel_size=0.05", "--max_depth=8", "--no-prune_outliers"])
    t_mesh = time.time() - t1
    from vcr_gaus_tpu.utils.ply import read_ply
    mesh = read_ply(os.path.join(logdir, "ours.ply"))
    n_verts = len(mesh["x"])
    assert n_verts > 5000, f"mesh too small: {n_verts} verts"

    import numpy as np
    from fixtures import make_cube_points

    from vcr_gaus_tpu.evaluation import geometry as GE
    gt_pts, _ = make_cube_points(4000, seed=0)
    mesh_pts = np.stack([mesh["x"], mesh["y"], mesh["z"]], 1)
    d2s = GE.nn_distances(mesh_pts, gt_pts).mean()
    s2d = GE.nn_distances(gt_pts, mesh_pts).mean()
    print(f"chamfer vs GT cube: d2s {d2s:.4f} s2d {s2d:.4f}", flush=True)
    assert d2s < 0.3, f"mesh accuracy off: d2s {d2s}"
    assert s2d < 1.0, f"mesh completeness off: s2d {s2d}"

    t2 = time.time()
    run([py, "render_eval.py", f"--cfg_path={logdir}/config.yaml"])
    t_eval = time.time() - t2
    results = None
    for root, _, files in os.walk(logdir):
        if "results.json" in files:
            results = json.load(open(os.path.join(root, "results.json")))
    assert results is not None, "results.json missing"
    psnr = results["PSNR"]
    assert psnr > 20, f"eval PSNR too low: {psnr}"

    print(json.dumps({
        "protocol": ("dtu_full_schedule_30k_half_res" if args.full30k
                     else "dtu_quick_quarter_res"),
        "iters": it,
        "train_wall_s": round(t_train, 1),
        "iters_per_s_incl_actions": round(it / t_train, 2),
        "mesh_wall_s": round(t_mesh, 1),
        "eval_wall_s": round(t_eval, 1),
        "mesh_verts": n_verts,
        "chamfer_d2s": round(float(d2s), 4),
        "chamfer_s2d": round(float(s2d), 4),
        "eval_psnr": round(psnr, 2),
    }), flush=True)
    print("protocol rehearsal OK", flush=True)


if __name__ == "__main__":
    main()
