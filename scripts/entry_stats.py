#!/usr/bin/env python
"""Entry-statistics reconciliation (VERDICT r3 next #5): compare the
protocol bench's SYNTHETIC population (bench.py --preset dtu_full inflates
knn-init scales 4x to proxy a trained model's tile coverage) against a REAL
trained population (e.g. the scripts/tpu_protocol.py rehearsal output).

For each population it reports, at a given resolution/tile, the statistics
that determine every E-wide stage's cost: per-camera entry counts
(peak/mean), entries per pixel, per-tile occupancy percentiles, and
projected screen-radius percentiles. If the synthetic proxy's
entries-per-pixel bracket the trained model's, the dtu_full headline
measures the right regime.

  # trained population (after scripts/tpu_protocol.py):
  python scripts/entry_stats.py --cfg_path /tmp/vcr_protocol/run/config.yaml
  # synthetic bench population at a matched shape:
  python scripts/entry_stats.py --synthetic --n 1000000 --cap 1048576 \
      --w 1600 --h 1200 --scale_mult 4.0 --tile 32

Pure-JAX binning only (no Pallas) — runs fine on CPU
(JAX_PLATFORMS=cpu) without touching the chip.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pcts(x, qs=(50, 90, 99, 100)):
    x = np.asarray(x)
    if x.size == 0:
        return {}
    return {f"p{q}": round(float(np.percentile(x, q)), 2) for q in qs}


def population_stats(state, cams, width, height, tile, budget):
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.ops import binning as B
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize_tpu as K
    from vcr_gaus_tpu.render.renderer import (RenderConfig,
                                              compute_camera_binning)
    K.set_tile(tile)
    rcfg = RenderConfig(width=width, height=height,
                        entry_budget=budget, mask_depth_thr=1e9)

    @jax.jit
    def stats_one(st, cam):
        aux = compute_camera_binning(st, cam, rcfg)
        p = st.params
        proj = PF.project_gaussians(
            p.xyz, st.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
            cam.tanfov[0], cam.tanfov[1], width, height, 1.0,
            opacity=st.opacity[:, 0])
        radius = jnp.where(st.active, proj.radius, 0)
        return (aux.binn.num_entries, aux.binn.tile_counts,
                radius, jnp.sum(radius > 0))

    entries, tile_p, radii_p, visible = [], [], [], []
    for cam in cams:
        ne, tc, rad, vis = stats_one(state, cam)
        entries.append(int(ne))
        tile_p.append(np.asarray(tc))
        radii_p.append(np.asarray(rad))
        visible.append(int(vis))
    tc = np.concatenate(tile_p)
    rad = np.concatenate(radii_p)
    rad = rad[rad > 0]
    n_tx, n_ty = B.tile_grid(width, height, tile)
    return {
        "n_cams": len(cams),
        "active": int(np.asarray(state.active).sum()),
        "visible_per_cam_mean": int(np.mean(visible)),
        "entries_peak": max(entries),
        "entries_mean": int(np.mean(entries)),
        "entries_per_pixel_peak": round(max(entries) / (width * height), 2),
        "entries_per_pixel_mean": round(
            float(np.mean(entries)) / (width * height), 2),
        "tile_grid": [n_tx, n_ty],
        "tile_occupancy": pcts(tc),
        "screen_radius_px": pcts(rad),
        "dup_factor": round(max(entries) / max(np.mean(visible), 1), 2),
    }


def synthetic_population(n, cap, scale_mult, width, height):
    """The bench.py dtu_full generator, verbatim geometry."""
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    r = np.sqrt(1 - z ** 2)
    pts = (np.stack([r * np.cos(theta), r * np.sin(theta), z], 1) * 1.5
           + np.array([0, 0, 4.0])).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
    if scale_mult != 1.0:
        state = state._replace(params=state.params._replace(
            log_scale=state.params.log_scale
            + np.float32(np.log(scale_mult))))
    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        cams.append(Camera(
            colmap_id=i, idx=i, image_name=f"b{i}", R=np.eye(3),
            T=np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang), 0.0]),
            fovx=0.9, fovy=0.7, width=width, height=height).arrays())
    cams = [jax.tree.map(jnp.asarray, c) for c in cams]
    return state, cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_path", default=None)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--w", type=int, default=None)
    ap.add_argument("--h", type=int, default=None)
    ap.add_argument("--scale_mult", type=float, default=4.0)
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--budget", type=int, default=1 << 23)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.synthetic:
        width, height = args.w or 1600, args.h or 1200
        tile = args.tile or 32
        state, cams = synthetic_population(args.n, args.cap,
                                           args.scale_mult, width, height)
        label = (f"synthetic n={args.n} scale_mult={args.scale_mult} "
                 f"{width}x{height}")
    else:
        assert args.cfg_path, "--cfg_path or --synthetic required"
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from depth2mesh import latest_iteration

        from vcr_gaus_tpu.config import Config
        from vcr_gaus_tpu.data.scene import load_scene_info
        from vcr_gaus_tpu.models import ply_io
        cfg = Config(args.cfg_path)
        logdir = os.path.dirname(os.path.abspath(args.cfg_path))
        it = (args.iteration if args.iteration > 0
              else latest_iteration(logdir))
        state = ply_io.load_gaussian_ply(
            os.path.join(logdir, "point_cloud", f"iteration_{it}",
                         "point_cloud.ply"),
            max_sh_degree=cfg.model.sh_degree)
        info = load_scene_info(cfg.model.source_path,
                               images_dir=cfg.model.images,
                               eval_split=cfg.model.eval,
                               llffhold=cfg.model.llffhold,
                               ratio=cfg.model.ratio,
                               use_meta_split=cfg.model.split,
                               resolution=cfg.model.resolution)
        cam0 = info.train_cameras[0]
        width = args.w or cam0.width
        height = args.h or cam0.height
        tile = args.tile or int(cfg.tpu.get("tile", 16))
        cams = [jax.tree.map(jnp.asarray, c.arrays(pixels=False))
                for c in info.train_cameras]
        label = f"trained {logdir} iter {it} {width}x{height}"

    out = population_stats(state, cams, width, height, tile, args.budget)
    out["population"] = label
    out["tile"] = tile
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
