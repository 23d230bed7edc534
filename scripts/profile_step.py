#!/usr/bin/env python
"""Stage-level timing of the training step on the current backend.

Times (separately jitted): binning+perm, raster forward, raster fwd+bwd via
grad, loss stack fwd+bwd, and the full train step — to direct kernel work.

  python scripts/profile_step.py [--n 100000] [--w 800] [--h 600]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, warmup=5, iters=20, **kw):
    import jax
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    # tunneled backends need a host fetch as fence
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--h", type=int, default=600)
    ap.add_argument("--budget", type=int, default=1 << 19)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.config import default_config
    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.render import renderer as RR
    from vcr_gaus_tpu.render.renderer import RenderConfig, render
    from vcr_gaus_tpu.train.trainer import Gates, NetState, make_train_step

    rng = np.random.default_rng(0)
    n = args.n
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    r = np.sqrt(1 - z ** 2)
    pts = (np.stack([r * np.cos(theta), r * np.sin(theta), z], 1) * 1.5
           + np.array([0, 0, 4.0])).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cap = 1 << int(np.ceil(np.log2(n * 1.3)))
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
    img = rng.uniform(0, 1, (3, args.h, args.w)).astype(np.float32)
    nrm = rng.normal(size=(3, args.h, args.w)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
    cam = Camera(colmap_id=0, idx=0, image_name="p", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=args.w,
                 height=args.h, image=img, normal=nrm).arrays()
    cam = jax.tree.map(jnp.asarray, cam)
    rcfg = RenderConfig(width=args.w, height=args.h, ch_sem=0,
                        depth_mode="intersection",
                        entry_budget=args.budget, mask_depth_thr=0.8)
    bg = jnp.zeros(3)

    # --- stage: geometry projection + binning + perm (the lookahead) ---
    prep = jax.jit(lambda st, c: RR.compute_camera_binning(st, c, rcfg))
    aux0 = prep(state, cam)
    print(f"bin_aux (project+bin+sort+perm): {timeit(prep, state, cam):7.2f} ms")

    # --- stage: full render forward (with precomputed bin aux) ---
    fwd = jax.jit(lambda st, c, a: render(
        st, c, rcfg, bg, sh_degree=3, scene_extent=4.0,
        bin_aux=a)["render"])
    print(f"render forward:                  {timeit(fwd, state, cam, aux0):7.2f} ms")

    # --- stage: render forward+backward ---
    def loss_fn(params, st, c, a):
        st = st._replace(params=params)
        out = render(st, c, rcfg, bg, sh_degree=3, scene_extent=4.0,
                     bin_aux=a)
        return jnp.mean(jnp.abs(out["render"] - c.image))

    gr = jax.jit(jax.grad(loss_fn))
    print(f"render fwd+bwd (L1 only):        {timeit(gr, state.params, state, cam, aux0):7.2f} ms")

    # --- full train step (bench parity) ---
    cfg = default_config()
    weights = {"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
               "depth_normal": 0.015, "l1_scale": 1.0}
    step = make_train_step(cfg, rcfg, weights, 4.0, np.zeros(3, np.float32),
                           np.full(3, 4.0, np.float32), 0, None, None)
    net = NetState(None, None, None, None, None)
    gates = Gates(True, True, False, False, True)
    lr = jnp.asarray(1.6e-4)

    bin_aux = None
    st = state

    def full(st, ba):
        st2, _, losses, aux = step(st, net, cam, bg, lr, sh_degree=3,
                                   gates=gates, bin_aux=ba, next_cam=cam)
        return st2, aux["next_bin_aux"], losses

    st, bin_aux, losses = full(st, bin_aux)
    for _ in range(5):
        st, bin_aux, losses = full(st, bin_aux)
    _ = float(losses["total"])
    t0 = time.time()
    it = 30
    for _ in range(it):
        st, bin_aux, losses = full(st, bin_aux)
    _ = float(losses["total"])
    dt = (time.time() - t0) / it * 1e3
    print(f"full train step:                 {dt:7.2f} ms "
          f"({1e3 / dt:.1f} it/s)")


if __name__ == "__main__":
    main()
