#!/usr/bin/env python
"""Benchmark: full training-step throughput (render fwd+bwd, loss stack,
Adam, densification stats) on a synthetic scene, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Presets (--preset):
  dev      (default) 100k gaussians, 800x600, D-Normal recipe — the driver's
           round-over-round comparison shape.
  dtu_full protocol scale (VERDICT r2 next #1): 1M active gaussians
           (capacity 2^20), 1600x1200 (the reference's auto-downscale cap,
           tools/camera_utils.py:33-50), full DTU recipe incl. the post-15k
           consistent_normal + distortion gates (configs/dtu/base.yaml).
           Splat scales are inflated 4x over the knn init so per-splat tile
           coverage matches a trained model rather than a fresh cloud.
           The entry budget is probed (peak over the camera pool + 25%
           headroom, 64k-quantized — the trainer right-sizer's steady
           state) and reported alongside the peak entry count.

Baseline assumption: the reference publishes no numbers (BASELINE.md); the
driver's north star is >=1.5x A100 training iters/sec. A100 VCR-GauS
iteration time is taken as 15 it/s at the dev shape (typical 3DGS-fork wandb
`time/iteration` ~60-70 ms at 100k/800x600) and 7 it/s at protocol scale
(~140 ms at 1M/1600x1200); vs_baseline = ours / assumption.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PRESETS = {
    "dev": dict(
        n_gaussians=100_000, capacity=131_072, width=800, height=600,
        scale_mult=1.0, baseline_iters_per_s=15.0, tile=16,
        weights={"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
                 "depth_normal": 0.015, "l1_scale": 1.0},
        # measured steady-state budget for this scene (peak ~348k entries
        # +25%, 64k-quantized); pinned so dev numbers stay comparable
        # round-over-round
        entry_budget=7 << 16,
    ),
    "dtu_full": dict(
        n_gaussians=1_000_000, capacity=1 << 20, width=1600, height=1200,
        # tile 32 at the protocol shape: E 7.8M -> 3.4M, step 1.69x faster
        # (measured 2026-08-19; tile 64 over-rotates to 2.49 it/s)
        scale_mult=4.0, baseline_iters_per_s=7.0, tile=32,
        # DTU recipe with every *_from_iter gate open
        # (configs/dtu/base.yaml: l1_scale 0.5, mono_normal 0.01,
        # consistent_normal 0.05, distortion 1000)
        weights={"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
                 "l1_scale": 0.5, "consistent_normal": 0.05,
                 "distortion": 1000.0},
        entry_budget=None,          # probed
    ),
}

STEPS_PER_CALL = 10            # supersteps: iterations per XLA dispatch
WARMUP, ITERS = 3, 10          # in supersteps (30 / 100 iterations)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="dev")
    ap.add_argument("--steps_per_call", type=int, default=STEPS_PER_CALL)
    ap.add_argument("--iters", type=int, default=ITERS,
                    help="timed supersteps")
    ap.add_argument("--cfg_path", default=None,
                    help="time the step on a TRAINED population instead of "
                         "the synthetic one: a logdir config.yaml whose "
                         "latest PLY + scene cameras replace the preset's "
                         "cloud (VERDICT r3 next #5 reconciliation)")
    ap.add_argument("--staged_cams", action="store_true",
                    help="cycle cameras through the trainer's device "
                         "camera cache (compact residency + on-device "
                         "decode per superstep) instead of pre-staging "
                         "f32 batches — the REAL training loop's staging "
                         "path (r4 VERDICT missing #2)")
    args = ap.parse_args()
    P = PRESETS[args.preset]
    n_gauss, cap = P["n_gaussians"], P["capacity"]
    width, height = P["width"], P["height"]
    k = args.steps_per_call

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.ops import rasterize_tpu as K
    K.set_tile(P["tile"])

    from vcr_gaus_tpu.config import default_config
    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.render.renderer import (RenderConfig,
                                              compute_camera_binning)
    from vcr_gaus_tpu.train.trainer import (Gates, NetState,
                                            make_multi_train_step)

    rng = np.random.default_rng(0)
    population = "synthetic"
    if args.cfg_path:
        # trained-population mode: latest PLY + the scene's real cameras
        from vcr_gaus_tpu.config import Config
        from vcr_gaus_tpu.data.scene import load_scene_info
        from vcr_gaus_tpu.models import ply_io
        from depth2mesh import latest_iteration
        tcfg = Config(args.cfg_path)
        logdir = os.path.dirname(os.path.abspath(args.cfg_path))
        it = latest_iteration(logdir)
        ply = os.path.join(logdir, "point_cloud", f"iteration_{it}",
                           "point_cloud.ply")
        state0 = ply_io.load_gaussian_ply(ply, max_sh_degree=3)
        n_gauss = int(np.asarray(state0.active).sum())
        cap = max(cap, 1 << (n_gauss - 1).bit_length())
        state = ply_io.load_gaussian_ply(ply, capacity=cap, max_sh_degree=3)
        K.set_tile(int(tcfg.tpu.get("tile", P["tile"])))
        K.set_chunk(int(tcfg.tpu.get("chunk", 256)))
        info = load_scene_info(tcfg.model.source_path,
                               resolution=tcfg.model.resolution)
        c0 = info.train_cameras[0]
        width, height = c0.width, c0.height
        cam_objs = info.train_cameras[:8]
        cams = [c.arrays() for c in cam_objs]
        population = f"trained {ply} ({n_gauss} gaussians)"
        print(f"trained population: {n_gauss} gaussians, cap {cap}, "
              f"{width}x{height}, tile {K.TILE}", file=sys.stderr)
    else:
        # surface-like cloud (sphere shell) approximating a trained DTU scan
        theta = rng.uniform(0, 2 * np.pi, n_gauss)
        z = rng.uniform(-1, 1, n_gauss)
        r = np.sqrt(1 - z ** 2)
        pts = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                       1).astype(np.float32)
        pts = pts * 1.5 + np.array([0, 0, 4.0], np.float32)
        cols = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
        state = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
        if P["scale_mult"] != 1.0:
            state = state._replace(params=state.params._replace(
                log_scale=state.params.log_scale
                + np.float32(np.log(P["scale_mult"]))))

        cam_objs = []
        for i in range(8):
            ang = 2 * np.pi * i / 8
            img = rng.uniform(0, 1, (3, height, width)).astype(np.float32)
            nrm = rng.normal(size=(3, height, width)).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
            cam_objs.append(Camera(
                colmap_id=i, idx=i, image_name=f"b{i}",
                R=np.eye(3), T=np.array([0.3 * np.cos(ang),
                                         0.3 * np.sin(ang), 0.0]),
                fovx=0.9, fovy=0.7, width=width, height=height,
                image=img, normal=nrm))
        cams = [c.arrays() for c in cam_objs]

    # pre-stage cameras on device: steady-state training overlaps the
    # host->device image transfer with compute (and the tunnel inflates
    # transfer cost far beyond production HBM links)
    cams = [jax.tree.map(jnp.asarray, c) for c in cams]

    cfg = default_config()
    weights = P["weights"]

    entry_budget = P["entry_budget"]
    peak_entries = None
    if entry_budget is None:
        # probe the true entry demand (num_entries is pre-truncation, so a
        # tiny probe budget suffices), then right-size like the trainer:
        # peak + 25% headroom, 64k-quantized
        probe_rcfg = RenderConfig(width=width, height=height, ch_sem=0,
                                  depth_mode="intersection",
                                  entry_budget=1 << 14)
        probe = jax.jit(lambda st, cam: compute_camera_binning(
            st, cam, probe_rcfg).binn.num_entries)
        peak_entries = max(int(probe(state, c)) for c in cams)
        q = 1 << 16
        entry_budget = max(q, -(-(peak_entries * 5 // 4) // q) * q)
        print(f"probe: peak_entries={peak_entries} -> "
              f"entry_budget={entry_budget}", file=sys.stderr)

    # DTU runs with the depth-threshold mask off (configs/dtu/base.yaml:
    # mask_depth_thr 0)
    rcfg = RenderConfig(width=width, height=height, ch_sem=0,
                        depth_mode="intersection",
                        entry_budget=entry_budget,
                        mask_depth_thr=(0.0 if args.preset == "dtu_full"
                                        else 0.8))
    # superstep dispatch (tpu.steps_per_call = 10, the configs/
    # reconstruct.yaml recipe default): k iterations chained in one XLA
    # program via lax.scan, so per-step dispatch overhead is paid once per
    # k steps (see trainer.make_multi_train_step)
    step = make_multi_train_step(cfg, rcfg, weights, 4.0,
                                 np.zeros(3, np.float32),
                                 np.full(3, 4.0, np.float32), 0, None, None,
                                 k=k)
    net = NetState(None, None, None, None, None)
    gates = Gates(True, True, False, True, True)
    bgs = jnp.zeros((k, 3))
    lrs = jnp.full((k,), 1.6e-4, jnp.float32)

    if args.staged_cams:
        # the REAL loop's staging: compact camera pytrees resident on
        # device (trainer._DeviceCamCache), stacked + decoded ON DEVICE
        # per superstep (trainer._decode_stack). After the first epoch the
        # pool is cache-resident, so steady state measures the on-device
        # decode + stack — the cost real training pays every superstep
        # that the pre-staged mode hides (r4 VERDICT missing #2).
        from vcr_gaus_tpu.data.cameras import decode_arrays
        from vcr_gaus_tpu.train.trainer import _DeviceCamCache
        cache = _DeviceCamCache(cam_objs, 2048 << 20)

        @jax.jit
        def _decode(*cs):
            return jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[decode_arrays(c) for c in cs])

        def batch(s):
            return _decode(*[cache.get((s * k + j) % 8) for j in range(k)])

        n_batches = 8 if args.preset == "dev" else 4
        batches = None
    else:
        def batch(s):
            # the s-th superstep's camera stack (cycling the 8-camera pool)
            return jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[cams[(s * k + j) % 8] for j in range(k)])

        # cover the pool's phases; fewer distinct stacks at protocol scale
        # (each (k,3,H,W) image stack is ~230 MB at 1600x1200)
        n_batches = 8 if args.preset == "dev" else 4
        batches = [batch(s) for s in range(n_batches)]

    def get_batch(s):
        s = s % n_batches
        return batch(s) if batches is None else batches[s]

    # binning lookahead (the Trainer's steady-state loop): each superstep
    # consumes the previous one's stacked binning and produces the next's.
    # The lookahead batch is carried (staged once, used twice) exactly like
    # trainer._train_superstep's self._staged.
    bin_aux = None
    cur = get_batch(0)
    for s in range(WARMUP):
        nxt = get_batch(s + 1)
        state, net, losses, aux = step(state, net, cur,
                                       bgs, lrs, sh_degree=3, gates=gates,
                                       bin_aux=bin_aux, next_cams=nxt)
        bin_aux = aux.pop("next_bin_aux")
        cur = nxt
    # NB block_until_ready does not synchronize on tunneled backends; a
    # scalar device->host fetch is the only reliable fence.
    _ = float(losses["total"])
    assert not bool(aux["overflow"]), "entry budget overflow in bench"
    if peak_entries is None:
        peak_entries = int(aux["num_entries"])

    t0 = time.time()
    for s in range(WARMUP, WARMUP + args.iters):
        nxt = get_batch(s + 1)
        state, net, losses, aux = step(state, net, cur,
                                       bgs, lrs, sh_degree=3, gates=gates,
                                       bin_aux=bin_aux, next_cams=nxt)
        bin_aux = aux.pop("next_bin_aux")
        cur = nxt
    _ = float(losses["total"])
    dt = (time.time() - t0) / (args.iters * k)
    its = 1.0 / dt

    # absolute utilization accounting (VERDICT r3 next #6): analytic
    # FLOPs/bytes of the step's algorithmic work vs v5e peaks — decouples
    # "is it fast" from the assumed A100 baseline
    from vcr_gaus_tpu.ops.binning import tile_grid
    from vcr_gaus_tpu.utils import roofline
    n_tx, n_ty = tile_grid(width, height, K.TILE)
    model = roofline.step_model(
        entries=min(int(aux["num_entries"]), entry_budget),
        tile=K.TILE, n_tiles=n_tx * n_ty, f_pad=K.feat_rows(0),
        g_chunk=K.G, blk=K.BLK, c_acc=6, c_pad=K.out_pad(0),
        capacity=cap, width=width, height=height, sh_degree=3)
    util = roofline.utilization(model, dt)

    base = P["baseline_iters_per_s"]
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(its, 3),
        "unit": (f"iters/sec ({n_gauss // 1000}k gaussians, "
                 f"{width}x{height}, "
                 + ("DTU full recipe" if args.preset == "dtu_full"
                    else "D-Normal recipe") + ")"),
        "vs_baseline": round(its / base, 3),
        # the A100 figure is an ASSUMPTION (reference publishes no numbers,
        # BASELINE.md): typical 3DGS-fork wandb time/iteration at the shape
        "baseline_assumed": True,
        "baseline_iters_per_s": base,
        # BASELINE.md's derived rasterizer metric: H*W / iter-time, i.e.
        # full fwd+bwd+losses+Adam pixel throughput
        "rasterizer_mpix_per_s": round(width * height * its / 1e6, 2),
        # iterations chained per XLA dispatch (the reconstruct.yaml recipe
        # default, trainer.make_multi_train_step)
        "steps_per_call": k,
        "preset": args.preset,
        "staged_cams": bool(args.staged_cams),
        "population": population,
        "n_gaussians": n_gauss,
        "capacity": cap,
        "resolution": f"{width}x{height}",
        "entry_budget": entry_budget,
        "peak_entries": peak_entries,
        "roofline": util,
    }))


if __name__ == "__main__":
    main()
