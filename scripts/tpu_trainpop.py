#!/usr/bin/env python
"""Train a PROTOCOL-SCALE population on-chip (VERDICT r3 next #5).

The dtu_full bench synthesizes its population (knn-init scales inflated 4x
"to match trained-model tile coverage") — this script produces the real
thing to reconcile against: a 1600x1200 scene with sharp geometry and
mid/high-frequency texture, trained with the full densify/reset/prune
schedule at capacity 2^20, so the saved PLY is an honestly-trained
protocol-shape population whose entry statistics (scripts/entry_stats.py)
and step timing (bench.py --ply) can be compared with the synthetic proxy.

Scene: a unit cube with a two-scale checker + hash-noise texture, GT images
ray-traced analytically (exact, sharp edges — the densifier has real work),
exact face normals as priors, COLMAP layout. Init: points on the cube
surface colored by the texture.

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/tpu_trainpop.py

Reference protocol being proxied: python_scripts/run_dtu.py:46-53 (30k
iters at <=1600 wide); the schedule here is window-scaled like
scripts/tpu_protocol.py.
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

import numpy as np


def cube_texture(p):
    """Procedural RGB at surface points p (N,3): two-scale checker + hash
    noise, face-tinted. Vectorized numpy; values in [0,1]."""
    q = (p + 1.0) * 4.0
    c1 = (np.floor(q[..., 0]) + np.floor(q[..., 1])
          + np.floor(q[..., 2])) % 2.0
    q2 = (p + 1.0) * 16.0
    c2 = (np.floor(q2[..., 0]) + np.floor(q2[..., 1])
          + np.floor(q2[..., 2])) % 2.0
    h = np.sin(p[..., 0] * 127.1 + p[..., 1] * 311.7 + p[..., 2] * 74.7)
    noise = (np.sin(h * 43758.5) + 1.0) * 0.5
    axis = np.argmax(np.abs(p), axis=-1)
    tint = np.stack([0.9 - 0.2 * (axis == 0), 0.9 - 0.2 * (axis == 1),
                     0.9 - 0.2 * (axis == 2)], axis=-1)
    base = 0.25 + 0.45 * c1 + 0.2 * c2 + 0.1 * noise
    return np.clip(base[..., None] * tint, 0.0, 1.0).astype(np.float32)


def raytrace_cube(R_w2c, T, width, height, fovx, fovy):
    """Exact ray-traced image (3,H,W), normal map (3,H,W camera space) and
    fg mask of the unit cube from a COLMAP-convention camera."""
    fx = 0.5 * width / np.tan(fovx / 2)
    fy = 0.5 * height / np.tan(fovy / 2)
    xs = (np.arange(width) + 0.5 - width / 2) / fx
    ys = (np.arange(height) + 0.5 - height / 2) / fy
    dx, dy = np.meshgrid(xs, ys)
    d_cam = np.stack([dx, dy, np.ones_like(dx)], -1)
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    R_c2w = R_w2c.T
    origin = -R_c2w @ T
    d = d_cam @ R_w2c                      # rays in world space
    # slab intersection with [-1,1]^3
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
    t0 = (-1.0 - origin) * inv
    t1 = (1.0 - origin) * inv
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax >= np.maximum(tmin, 1e-4))
    t = np.where(hit, tmin, np.nan)
    p = origin + t[..., None] * d
    img = np.where(hit[..., None], cube_texture(np.nan_to_num(p)), 0.55)
    # outward face normal at the hit point, flipped toward the camera,
    # expressed in camera space (the prior convention)
    axis = np.argmax(np.abs(np.nan_to_num(p)), axis=-1)
    n_w = np.zeros_like(p)
    np.put_along_axis(n_w, axis[..., None],
                      np.sign(np.take_along_axis(np.nan_to_num(p),
                                                 axis[..., None], -1)), -1)
    n_w = np.where((n_w * d).sum(-1, keepdims=True) > 0, -n_w, n_w)
    n_c = n_w @ R_c2w                      # world -> camera rotation
    n_c = np.where(hit[..., None], n_c, [0.0, 0.0, -1.0])
    return (img.transpose(2, 0, 1).astype(np.float32),
            n_c.transpose(2, 0, 1).astype(np.float32),
            hit.astype(np.uint8))


def write_scene(root, n_cams, n_pts, width, height):
    from PIL import Image

    from fixtures import ring_cameras
    from vcr_gaus_tpu.utils import colmap as CM
    from vcr_gaus_tpu.utils import graphics as G
    from vcr_gaus_tpu.utils.math import rotmat_to_quat

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    for sub in ("images", "normals", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    rng = np.random.default_rng(0)
    face = rng.integers(0, 6, n_pts)
    uv = rng.uniform(-1, 1, (n_pts, 2))
    pts = np.zeros((n_pts, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    cols_idx = np.stack([(axis + 1) % 3, (axis + 2) % 3], 1)
    np.put_along_axis(pts, axis[:, None], sign[:, None], 1)
    np.put_along_axis(pts, cols_idx, uv, 1)
    colors = cube_texture(pts)

    fovx, fovy = 0.9, 0.7
    fx, fy = G.fov2focal(fovx, width), G.fov2focal(fovy, height)
    CM.write_cameras_binary(
        {1: CM.ColmapCamera(1, "PINHOLE", width, height,
                            np.array([fx, fy, width / 2, height / 2]))},
        os.path.join(root, "sparse/0/cameras.bin"))
    images = {}
    for i, (R_w2c, T) in enumerate(ring_cameras(n_cams)):
        name = f"img_{i:03d}.png"
        img, nrm, mask = raytrace_cube(R_w2c, T, width, height, fovx, fovy)
        Image.fromarray((img.transpose(1, 2, 0) * 255).astype(
            np.uint8)).save(os.path.join(root, "images", name))
        np.savez(os.path.join(root, "normals", f"img_{i:03d}.npz"),
                 nrm.astype(np.float16))
        Image.fromarray(mask).save(os.path.join(root, "masks", name))
        images[i + 1] = CM.ColmapImage(i + 1, rotmat_to_quat(R_w2c), T, 1,
                                       name)
    CM.write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))
    CM.write_points3d_binary(pts, colors * 255,
                             os.path.join(root, "sparse/0/points3D.bin"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vcr_trainpop")
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--n_cams", type=int, default=16)
    ap.add_argument("--n_pts", type=int, default=150_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--capacity", type=int, default=1 << 20)
    args = ap.parse_args()

    scene = os.path.join(args.workdir, "scene")
    logdir = os.path.join(args.workdir, "run")
    shutil.rmtree(args.workdir, ignore_errors=True)
    t0 = time.time()
    write_scene(scene, args.n_cams, args.n_pts, args.width, args.height)
    print(f"scene written ({time.time() - t0:.0f}s)", flush=True)

    py, it = sys.executable, args.iters
    t0 = time.time()
    cmd = [py, "train.py", "--config=configs/config_base.yaml",
           f"--model.source_path={scene}", f"--logdir={logdir}",
           "--model.depth_type=intersection",
           f"--optim.iterations={it}",
           # window-scaled reference cadence (config_base.yaml:40-63)
           "--optim.densify_from_iter=500",
           f"--optim.densify_until_iter={int(it * 0.7)}",
           "--optim.densification_interval=100",
           "--optim.opacity_reset_interval=3000",
           f"--optim.prune.iterations=[{int(it * 0.8)},{int(it * 0.9)}]",
           # DTU recipe weights (configs/dtu/base.yaml)
           "--optim.loss_weight.mono_normal=0.01",
           "--optim.loss_weight.depth_normal=0.015",
           "--optim.loss_weight.l1_scale=0.5",
           f"--tpu.capacity={args.capacity}",
           "--tpu.tile=32",
           "--tpu.steps_per_call=10",
           f"--train.save_iterations=[{it}]",
           f"--train.test_iterations=[{it}]"]
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    assert r.returncode == 0, "train failed"
    t_train = time.time() - t0
    ply = os.path.join(logdir, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    assert os.path.exists(ply), "PLY missing"

    from vcr_gaus_tpu.utils.ply import read_ply
    n_final = len(read_ply(ply)["x"])
    print(json.dumps({
        "protocol": "trained_population_1600x1200",
        "iters": it,
        "train_wall_s": round(t_train, 1),
        "iters_per_s_incl_actions": round(it / t_train, 2),
        "final_gaussians": n_final,
        "ply": ply,
        "cfg": os.path.join(logdir, "config.yaml"),
    }), flush=True)


if __name__ == "__main__":
    main()
