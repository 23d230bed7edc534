#!/usr/bin/env python
"""Early-termination granularity headroom (round-4 protocol-perf diagnosis).

The Pallas rasterizer terminates a tile's chunk walk once EVERY pixel of the
tile has transmittance < T_EPS (rasterize_tpu._fwd_kernel). At tile 32 that
consensus spans 1024 pixels — one uncovered pixel (background ray, or a gap
between splats' 1/255 cutoff) keeps all 1024 pixels compositing through
every chunk. The CUDA fork's consensus granularity is its 16x16 block
(256 threads, __syncthreads_count in forward.cu); finer consensus = earlier
termination = fewer (pixel, entry) pairs.

This script measures, WITHOUT touching the kernels, how much pair-work each
consensus granularity would do on a real binning of a real population:

  tile   — the current kernel policy (chunk skip on tile-max T)
  strip  — per 128-pixel sublane strip (8 strips per tile-32 region;
           the natural Mosaic granularity: (128, G) VPU blocks and
           (128, BLK) MXU matmuls can be guarded per strip)
  pixel  — the CUDA per-thread ideal (lower bound, not expressible in
           vector registers without masking overhead)

Populations: the bench's synthetic sphere shell (--synthetic, bench.py
dtu_full proxy) or a trained logdir (--cfg_path, e.g. the tpu_protocol /
tpu_trainpop output). Pure JAX binning + numpy compositing on CPU — run
with JAX_PLATFORMS=cpu; a --max_tiles sample keeps it minutes.

Reference: diff-gaussian-rasterization fork forward.cu (T < 1e-4 per
pixel, block-consensus break), SURVEY.md section 2.3#1.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_EPS = 1e-4
ALPHA_EPS = 1.0 / 255.0
ALPHA_CAP = 0.99


def build_synthetic(n_gauss, cap, scale_mult, width, height, cam_idx=0):
    import jax.numpy as jnp

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM

    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, n_gauss)
    z = rng.uniform(-1, 1, n_gauss)
    r = np.sqrt(1 - z ** 2)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   1).astype(np.float32)
    pts = pts * 1.5 + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
    if scale_mult != 1.0:
        state = state._replace(params=state.params._replace(
            log_scale=state.params.log_scale + np.float32(np.log(scale_mult))))
    ang = 2 * np.pi * cam_idx / 8
    cam = Camera(colmap_id=0, idx=0, image_name="b0", R=np.eye(3),
                 T=np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang), 0.0]),
                 fovx=0.9, fovy=0.7, width=width, height=height,
                 image=np.zeros((3, height, width), np.float32)).arrays()
    return state, cam, width, height


def load_trained(cfg_path, cam_idx=0):
    from depth2mesh import latest_iteration
    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.data.scene import load_scene_info
    from vcr_gaus_tpu.models import ply_io

    tcfg = Config(cfg_path)
    logdir = os.path.dirname(os.path.abspath(cfg_path))
    it = latest_iteration(logdir)
    ply = os.path.join(logdir, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    state0 = ply_io.load_gaussian_ply(ply, max_sh_degree=3)
    n = int(np.asarray(state0.active).sum())
    cap = 1 << max(10, (n - 1).bit_length())
    state = ply_io.load_gaussian_ply(ply, capacity=cap, max_sh_degree=3)
    info = load_scene_info(tcfg.model.source_path,
                           resolution=tcfg.model.resolution)
    c = info.train_cameras[cam_idx % len(info.train_cameras)]
    return state, c.arrays(), c.width, c.height


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--scale_mult", type=float, default=4.0)
    ap.add_argument("--w", type=int, default=1600)
    ap.add_argument("--h", type=int, default=1200)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--max_tiles", type=int, default=400,
                    help="random tile sample (0 = all tiles)")
    ap.add_argument("--cam", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vcr_gaus_tpu.ops import binning as B
    from vcr_gaus_tpu.ops import projection as PF

    if args.cfg_path:
        state, cam, width, height = load_trained(args.cfg_path, args.cam)
        pop = f"trained {args.cfg_path}"
    else:
        state, cam, width, height = build_synthetic(
            args.n, args.cap, args.scale_mult, args.w, args.h, args.cam)
        pop = f"synthetic n={args.n} scale_mult={args.scale_mult}"

    tile, G = args.tile, args.chunk
    P = tile * tile
    proj = PF.project_gaussians(
        state.params.xyz, state.scaling, state.params.quat, cam.viewmatrix,
        cam.projmatrix, cam.tanfov[0], cam.tanfov[1], width, height, 1.0,
        opacity=state.opacity[:, 0])
    radius = jnp.where(state.active, proj.radius, 0)
    budget = args.budget
    if budget is None:
        # generous: no truncation distorts the study
        probe = B.bin_gaussians(proj.mean2d, radius, proj.depth_z, width,
                                height, tile, 1 << 14, align=128,
                                extents=proj.ext)
        budget = int(-(-int(probe.num_entries) * 9 // 8 // 65536) * 65536)
        print(f"probed entries={int(probe.num_entries)} -> budget {budget}",
              file=sys.stderr)
    binn = B.bin_gaussians(proj.mean2d, radius, proj.depth_z, width, height,
                           tile, budget, align=128, extents=proj.ext)
    assert not bool(binn.overflow), "raise --budget"

    gid = np.asarray(binn.sorted_gid)
    starts = np.asarray(binn.tile_starts)
    counts = np.asarray(binn.tile_counts)
    n_cap = state.params.xyz.shape[0]
    # per-gaussian rows, padded with a zero row for pad gid == N
    mean2d = np.vstack([np.asarray(proj.mean2d), np.zeros((1, 2), np.float32)])
    conic = np.vstack([np.asarray(proj.conic), np.zeros((1, 3), np.float32)])
    op = np.concatenate([np.asarray(state.opacity[:, 0]),
                         np.zeros(1, np.float32)])

    n_tx = -(-width // tile)
    n_ty = -(-height // tile)
    num_tiles = n_tx * n_ty
    tids = np.arange(num_tiles)
    if args.max_tiles and num_tiles > args.max_tiles:
        tids = np.random.default_rng(1).choice(
            num_tiles, args.max_tiles, replace=False)

    pix = np.arange(P)
    n_strips = P // 128
    # pair-work accumulators, in (pixel, composited-entry) pairs
    work = dict(none=0.0, tile=0.0, strip=0.0, pixel=0.0)
    chunks = dict(none=0, tile=0, strip=0.0)
    sampled_entries = 0
    for t in tids:
        cnt = int(counts[t])
        nch = -(-cnt // G) if cnt else 0
        sampled_entries += cnt
        if cnt == 0:
            continue
        ty, tx = divmod(int(t), n_tx)
        px = (tx * tile + pix % tile).astype(np.float32)
        py = (ty * tile + pix // tile).astype(np.float32)
        g = gid[starts[t]:starts[t] + cnt]
        dx = px[None, :] - mean2d[g, 0:1]          # (cnt, P)
        dy = py[None, :] - mean2d[g, 1:2]
        A = conic[g, 0:1]
        Bc = conic[g, 1:2]
        C = conic[g, 2:3]
        power = -0.5 * (A * dx * dx + C * dy * dy) - Bc * dx * dy
        alpha_raw = op[g, None] * np.exp(np.minimum(power, 0.0))
        live = (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
        alpha = np.where(live, np.minimum(alpha_raw, ALPHA_CAP), 0.0)
        logt = np.cumsum(np.log1p(-alpha), axis=0)    # (cnt, P) inclusive
        # first entry index AFTER which T < eps, per pixel; cnt if never
        term = np.where(logt < np.log(T_EPS), 1, 0)
        t_idx = np.where(term.any(0), term.argmax(0) + 1, cnt)  # (P,)
        work["none"] += nch * G * P
        chunks["none"] += nch
        ch_tile = min(-(-int(t_idx.max()) // G), nch)
        work["tile"] += ch_tile * G * P
        chunks["tile"] += ch_tile
        strip_max = t_idx.reshape(n_strips, 128).max(1)
        ch_strip = np.minimum(-(-strip_max // G), nch)
        work["strip"] += float(ch_strip.sum()) * G * 128
        chunks["strip"] += float(ch_strip.sum()) / n_strips
        work["pixel"] += float(t_idx.sum())

    frac = len(tids) / num_tiles
    res = {
        "population": pop,
        "resolution": f"{width}x{height}", "tile": tile, "chunk": G,
        "num_entries": int(binn.num_entries),
        "tiles_sampled": len(tids), "tiles_total": num_tiles,
        "sample_frac": round(frac, 4),
        "pair_work_gpairs": {k: round(v / 1e9, 3) for k, v in work.items()},
        "saved_vs_none": {k: round(1.0 - work[k] / max(work["none"], 1), 4)
                          for k in ("tile", "strip", "pixel")},
        "speedup_vs_tile": {k: round(work["tile"] / max(work[k], 1), 3)
                            for k in ("strip", "pixel")},
        "chunks": {k: round(v, 1) for k, v in chunks.items()},
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
