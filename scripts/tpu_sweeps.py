#!/usr/bin/env python
"""On-chip timing gate for the jit-cached non-training sweeps (VERDICT r2
weak #1): a 50-camera FULL-RES (1600x1200) evaluate() sweep and a
300-camera render_stats sweep must each complete in seconds, not minutes.

The round-2 eager paths paid one tunnel dispatch per op (dozens per
camera); the jit-cached programs (trainer._eval_metrics_fn, _stats_sweep)
pay one dispatch per camera / per 64-camera scan chunk and fetch scalars
only. This script measures both on the real chip at protocol resolution.

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/tpu_sweeps.py

First run pays multi-minute compiles (persistent cache makes re-runs
cheap); the timed section starts after a 1-camera warmup of each program.
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def write_flat_scene(root, n_cams, n_pts, width, height):
    """COLMAP-layout scene with flat-color images (PNG encode of noise at
    1600x1200 x50 would dominate setup; eval timing only needs pixels to
    exist)."""
    from PIL import Image

    from fixtures import make_cube_points, ring_cameras
    from vcr_gaus_tpu.utils import colmap as CM
    from vcr_gaus_tpu.utils import graphics as G
    from vcr_gaus_tpu.utils.math import rotmat_to_quat

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    pts, colors = make_cube_points(n_pts)
    fovx, fovy = 0.9, 0.7
    fx, fy = G.fov2focal(fovx, width), G.fov2focal(fovy, height)
    CM.write_cameras_binary(
        {1: CM.ColmapCamera(1, "PINHOLE", width, height,
                            np.array([fx, fy, width / 2, height / 2]))},
        os.path.join(root, "sparse/0/cameras.bin"))
    img = Image.new("RGB", (width, height), (96, 112, 128))
    images = {}
    for i, (R_w2c, T) in enumerate(ring_cameras(n_cams)):
        name = f"img_{i:03d}.png"
        img.save(os.path.join(root, "images", name))
        images[i + 1] = CM.ColmapImage(i + 1, rotmat_to_quat(R_w2c),
                                       T, 1, name)
    CM.write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))
    CM.write_points3d_binary(pts, colors * 255,
                             os.path.join(root, "sparse/0/points3D.bin"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vcr_sweeps")
    ap.add_argument("--n_eval_cams", type=int, default=50)
    ap.add_argument("--n_stats_cams", type=int, default=300)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--n_pts", type=int, default=100_000)
    args = ap.parse_args()

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    scene = os.path.join(args.workdir, "scene")
    shutil.rmtree(args.workdir, ignore_errors=True)
    t0 = time.time()
    write_flat_scene(scene, args.n_eval_cams, args.n_pts,
                     args.width, args.height)
    print(f"scene written ({time.time() - t0:.1f}s)", flush=True)

    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.train.trainer import Trainer
    c = Config(os.path.join(REPO, "configs/config_base.yaml"))
    c.logdir = os.path.join(args.workdir, "log")
    c.model.source_path = scene
    c.model.resolution = 1
    c.model.depth_type = "intersection"
    c.tpu.capacity = 131_072
    c.optim.densify_from_iter = 10 ** 9
    tr = Trainer(c)
    n_active = int(np.asarray(tr.state.active).sum())
    print(f"trainer up: {n_active} active gaussians, "
          f"{len(tr.scene.train_cameras)} cams at "
          f"{args.width}x{args.height}", flush=True)

    # ---- evaluate(): full-res metrics sweep --------------------------------
    t0 = time.time()
    _ = tr.evaluate(max_cams=1)                 # compile + warm
    t_compile_eval = time.time() - t0
    t0 = time.time()
    res = tr.evaluate()                         # all n_eval_cams cameras
    t_eval = time.time() - t0
    print(f"evaluate: {args.n_eval_cams} cams full-res in {t_eval:.1f}s "
          f"(compile {t_compile_eval:.1f}s) psnr={res['psnr']:.2f}",
          flush=True)

    # ---- stats sweep: 300 cameras, geometry-only ---------------------------
    base = tr._full_stats_cams()
    stats_cams = [base[i % len(base)] for i in range(args.n_stats_cams)]
    t0 = time.time()
    _ = tr._stats_sweep(stats_cams[:1], tr.rcfg)   # compile + warm
    t_compile_stats = time.time() - t0
    t0 = time.time()
    count, imp = tr._stats_sweep(stats_cams, tr.rcfg)
    n_seen = int(np.asarray(count > 0).sum())
    t_stats = time.time() - t0
    print(f"stats sweep: {args.n_stats_cams} cams in {t_stats:.1f}s "
          f"(compile {t_compile_stats:.1f}s), {n_seen} gaussians seen",
          flush=True)

    assert n_seen > 0, "stats sweep saw no gaussians"
    assert t_eval < 120, f"eval sweep too slow: {t_eval:.1f}s"
    assert t_stats < 120, f"stats sweep too slow: {t_stats:.1f}s"
    print(json.dumps({
        "eval_cams": args.n_eval_cams, "eval_wall_s": round(t_eval, 1),
        "eval_s_per_cam": round(t_eval / args.n_eval_cams, 3),
        "stats_cams": args.n_stats_cams, "stats_wall_s": round(t_stats, 1),
        "stats_s_per_cam": round(t_stats / args.n_stats_cams, 4),
        "resolution": f"{args.width}x{args.height}",
        "active_gaussians": n_active,
    }), flush=True)
    print("sweep timing OK", flush=True)


if __name__ == "__main__":
    main()
