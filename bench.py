#!/usr/bin/env python
"""Benchmark: full training-step throughput (render fwd+bwd, loss stack,
Adam, densification stats) on a DTU-scale synthetic scene, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline assumption: the reference publishes no numbers (BASELINE.md); the
driver's north star is >=1.5x A100 training iters/sec. A100 VCR-GauS
iteration time at this scale (~100k gaussians, 800x600, D-Normal recipe) is
taken as 15 it/s (typical 3DGS-fork wandb `time/iteration` ~60-70 ms);
vs_baseline = ours / 15.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_BASELINE_ITERS_PER_S = 15.0

N_GAUSSIANS = 100_000
CAPACITY = 131_072
WIDTH, HEIGHT = 800, 600
STEPS_PER_CALL = 10            # supersteps: iterations per XLA dispatch
WARMUP, ITERS = 3, 10          # in supersteps (30 / 100 iterations)


def main():
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.render.renderer import RenderConfig
    from vcr_gaus_tpu.train.trainer import (Gates, NetState,
                                            make_multi_train_step)
    from vcr_gaus_tpu.config import default_config

    rng = np.random.default_rng(0)
    # surface-like cloud (sphere shell) approximating a trained DTU scan
    theta = rng.uniform(0, 2 * np.pi, N_GAUSSIANS)
    z = rng.uniform(-1, 1, N_GAUSSIANS)
    r = np.sqrt(1 - z ** 2)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   1).astype(np.float32)
    pts = pts * 1.5 + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(0, 1, (N_GAUSSIANS, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, CAPACITY, sh_degree=3)

    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        img = rng.uniform(0, 1, (3, HEIGHT, WIDTH)).astype(np.float32)
        nrm = rng.normal(size=(3, HEIGHT, WIDTH)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
        cams.append(Camera(
            colmap_id=i, idx=i, image_name=f"b{i}",
            R=np.eye(3), T=np.array([0.3 * np.cos(ang), 0.3 * np.sin(ang),
                                     0.0]),
            fovx=0.9, fovy=0.7, width=WIDTH, height=HEIGHT,
            image=img, normal=nrm).arrays())

    # pre-stage cameras on device: steady-state training overlaps the
    # host->device image transfer with compute (and the tunnel inflates
    # transfer cost far beyond production HBM links)
    cams = [jax.tree.map(jnp.asarray, c) for c in cams]

    cfg = default_config()
    weights = {"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
               "depth_normal": 0.015, "l1_scale": 1.0}
    # entry budget = the trainer's right-sizer steady state for this scene:
    # measured peak ~348k (gaussian,tile) entries over the 8 cameras, +25%
    # headroom, quantized to 64k slots (trainer.train_step right-sizing) —
    # the binning sort / entry gather / grad segment-sum all scale with it
    rcfg = RenderConfig(width=WIDTH, height=HEIGHT, ch_sem=0,
                        depth_mode="intersection",
                        entry_budget=7 << 16, mask_depth_thr=0.8)
    # superstep dispatch (tpu.steps_per_call = 10, the configs/
    # reconstruct.yaml recipe default): K iterations chained in one XLA
    # program via lax.scan, so per-step dispatch overhead is paid once per
    # K steps (see trainer.make_multi_train_step)
    step = make_multi_train_step(cfg, rcfg, weights, 4.0,
                                 np.zeros(3, np.float32),
                                 np.full(3, 4.0, np.float32), 0, None, None,
                                 k=STEPS_PER_CALL)
    net = NetState(None, None, None, None, None)
    gates = Gates(True, True, False, False, True)
    bgs = jnp.zeros((STEPS_PER_CALL, 3))
    lrs = jnp.full((STEPS_PER_CALL,), 1.6e-4, jnp.float32)

    def batch(s):
        # the s-th superstep's camera stack (cycling the 8-camera pool)
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[cams[(s * STEPS_PER_CALL + j) % 8]
              for j in range(STEPS_PER_CALL)])

    batches = [batch(s) for s in range(8)]   # covers all phases of the pool

    # binning lookahead (the Trainer's steady-state loop): each superstep
    # consumes the previous one's stacked binning and produces the next's
    bin_aux = None
    for s in range(WARMUP):
        state, net, losses, aux = step(state, net, batches[s % 8], bgs, lrs,
                                       sh_degree=3, gates=gates,
                                       bin_aux=bin_aux,
                                       next_cams=batches[(s + 1) % 8])
        bin_aux = aux.pop("next_bin_aux")
    # NB block_until_ready does not synchronize on tunneled backends; a
    # scalar device->host fetch is the only reliable fence.
    _ = float(losses["total"])
    assert not bool(aux["overflow"]), "entry budget overflow in bench"

    t0 = time.time()
    for s in range(ITERS):
        state, net, losses, aux = step(state, net, batches[s % 8], bgs, lrs,
                                       sh_degree=3, gates=gates,
                                       bin_aux=bin_aux,
                                       next_cams=batches[(s + 1) % 8])
        bin_aux = aux.pop("next_bin_aux")
    _ = float(losses["total"])
    dt = (time.time() - t0) / (ITERS * STEPS_PER_CALL)
    its = 1.0 / dt

    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(its, 3),
        "unit": "iters/sec (100k gaussians, 800x600, D-Normal recipe)",
        "vs_baseline": round(its / A100_BASELINE_ITERS_PER_S, 3),
        # the A100 figure is an ASSUMPTION (reference publishes no numbers,
        # BASELINE.md): 15 it/s ~ typical 3DGS-fork wandb time/iteration
        "baseline_assumed": True,
        "baseline_iters_per_s": A100_BASELINE_ITERS_PER_S,
        # BASELINE.md's derived rasterizer metric: H*W / iter-time, i.e.
        # full fwd+bwd+losses+Adam pixel throughput
        "rasterizer_mpix_per_s": round(WIDTH * HEIGHT * its / 1e6, 2),
        # iterations chained per XLA dispatch (the reconstruct.yaml recipe
        # default, trainer.make_multi_train_step)
        "steps_per_call": STEPS_PER_CALL,
    }))


if __name__ == "__main__":
    main()
