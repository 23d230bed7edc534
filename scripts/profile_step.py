#!/usr/bin/env python
"""Stage-level timing of the training step on the current backend.

Every stage is timed INSIDE a lax.scan chain (k iterations per dispatch,
data dependency threaded through the carry), so the numbers are honest
device times even on tunneled backends where per-dispatch overhead and
async pipelining poison one-jit-per-call timing. Stage index provenance
matches production: precomputed BinAux enters as scan xs (program inputs),
exactly like the superstep trainer.

  python scripts/profile_step.py [--n 100000] [--w 800] [--h 600]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPS = 1e-20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=800)
    ap.add_argument("--h", type=int, default=600)
    ap.add_argument("--budget", type=int, default=7 << 16)
    ap.add_argument("--cap", type=int, default=0,
                    help="model capacity (0 = next pow2 >= 1.3n; pass "
                         "1048576 to match bench.py --preset dtu_full)")
    ap.add_argument("--k", type=int, default=8, help="scan length")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter: run only matching stages")
    ap.add_argument("--scale_mult", type=float, default=1.0,
                    help="inflate splat scales (4.0 = bench.py dtu_full's "
                         "trained-model tile coverage)")
    ap.add_argument("--tile", type=int, default=16,
                    help="rasterizer tile edge (32 = the 1600-wide recipe "
                         "default; VCR_TILE env overrides)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.config import default_config
    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.ops import rasterize_tpu as K
    from vcr_gaus_tpu.ops import binning as B
    from vcr_gaus_tpu.render import renderer as RR
    from vcr_gaus_tpu.render.renderer import RenderConfig, render
    from vcr_gaus_tpu.train.trainer import (Gates, NetState,
                                            _make_step_impl)

    K.set_tile(args.tile)

    kk, iters = args.k, args.iters

    def dep(c, *outs):
        """Fold a data dependency on `outs` into carry `c` (cheap)."""
        s = sum(jnp.sum(o).astype(jnp.float32) for o in outs
                if o is not None)
        return jax.tree.map(
            lambda x: x + (EPS * s).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, c)

    def scan_time(label, body, carry0, xs=None):
        """body: (carry, x) -> carry. Prints ms/iter of pure device time."""
        if args.only and not any(s in label
                                 for s in args.only.split(",")):
            return 0.0
        @jax.jit
        def run(c, xs):
            def f(c, x):
                return body(c, x), 0.0
            c, _ = jax.lax.scan(f, c, xs, length=None if xs is not None
                                else kk)
            return sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree.leaves(c)
                       if jnp.issubdtype(x.dtype, jnp.floating))
        s = run(carry0, xs)
        _ = float(s)
        t0 = time.time()
        for _ in range(iters):
            s = run(carry0, xs)
        _ = float(s)
        ms = (time.time() - t0) / (iters * kk) * 1e3
        print(f"{label:34s} {ms:7.2f} ms")
        return ms

    rng = np.random.default_rng(0)
    n = args.n
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    r = np.sqrt(1 - z ** 2)
    pts = (np.stack([r * np.cos(theta), r * np.sin(theta), z], 1) * 1.5
           + np.array([0, 0, 4.0])).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cap = args.cap or 1 << int(np.ceil(np.log2(n * 1.3)))
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
    if args.scale_mult != 1.0:
        state = state._replace(params=state.params._replace(
            log_scale=state.params.log_scale
            + np.float32(np.log(args.scale_mult))))
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
    print(f"n={n} cap={cap} {args.w}x{args.h} budget={args.budget} "
          f"scan k={kk} x {iters}")

    # ---- frozen single-camera geometry for the isolated stages ----
    p = state.params
    proj0 = jax.jit(lambda xyz: PF.project_gaussians(
        xyz, state.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
        cam.tanfov[0], cam.tanfov[1], args.w, args.h, 1.0,
        opacity=state.opacity[:, 0]))(p.xyz)
    radius0 = jnp.where(state.active, proj0.radius, 0)
    aux0 = jax.jit(lambda st: RR.compute_camera_binning(st, cam, rcfg)
                   )(state)
    ba_xs = jax.tree.map(lambda x: jnp.stack([x] * kk), aux0)
    nfeat = PF.feature_dim(0)
    f_pad = K.feat_rows(0)
    payload0 = jnp.asarray(
        rng.normal(size=(f_pad, cap)).astype(np.float32))   # transposed
    n_tx, n_ty = B.tile_grid(args.w, args.h, K.TILE)
    cam_vec = jnp.concatenate([cam.intr, bg, jnp.zeros((1,))]
                              ).astype(jnp.float32)

    # 1. projection forward
    def body_proj(xyz, _):
        pr = PF.project_gaussians(
            xyz, state.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
            cam.tanfov[0], cam.tanfov[1], args.w, args.h, 1.0,
            opacity=state.opacity[:, 0])
        return dep(xyz, pr.mean2d, pr.depth_z, pr.ext)
    scan_time("projection fwd", body_proj, p.xyz)

    # 1b. projection fwd+bwd (grads wrt means/scales/quats, all outputs)
    def body_projb(carry, _):
        xyz, sc, qu = carry
        def f(x3, s3, q4):
            pr = PF.project_gaussians(
                x3, s3, q4, cam.viewmatrix, cam.projmatrix, cam.tanfov[0],
                cam.tanfov[1], args.w, args.h, 1.0,
                opacity=state.opacity[:, 0])
            return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic)
                    + jnp.sum(pr.depth_z) + jnp.sum(pr.mean_cam)
                    + jnp.sum(pr.ext))
        g = jax.grad(f, argnums=(0, 1, 2))(xyz, sc, qu)
        return dep(carry, *g)
    scan_time("projection fwd+bwd", body_projb,
              (p.xyz, state.scaling, p.quat))

    # 1c. SH eval fwd+bwd (deg 3, grads wrt coeffs and dirs)
    from vcr_gaus_tpu.utils import sh as SH
    shs0 = jnp.swapaxes(jnp.concatenate(
        [p.f_dc, p.f_rest], axis=1), 1, 2)               # (C,3,K+1)
    dirs0 = p.xyz / jnp.maximum(
        jnp.linalg.norm(p.xyz, axis=1, keepdims=True), 1e-8)

    def body_sh(carry, _):
        shs, dirs = carry
        def f(s, d):
            return jnp.sum(jnp.maximum(SH.eval_sh(3, s, d) + 0.5, 0.0))
        g = jax.grad(f, argnums=(0, 1))(shs, dirs)
        return dep(carry, *g)
    scan_time("sh eval fwd+bwd (deg3)", body_sh, (shs0, dirs0))

    # 2. lookahead binning (bin sort + perm sort + fills + histogram)
    def body_bin(md, _):
        ba = R.compute_bin_aux(md, radius0, proj0.depth_z, args.w, args.h,
                               args.budget, extents=proj0.ext)
        return dep(md, ba.binn.sorted_gid.astype(jnp.float32)[:128],
                   ba.perm.astype(jnp.float32)[:128])
    scan_time("lookahead (bin+perm sorts)", body_bin, proj0.mean2d)

    # 3. entry build fwd (payload row gather, xs indices)
    build_pre = R._make_entry_builder_pre(args.budget)
    def body_egf(payload, ba):
        e = build_pre(payload, ba.binn.sorted_gid, ba.perm,
                      ba.binn.gauss_offsets, ba.binn.gauss_counts,
                      ba.binn.num_entries)
        return dep(payload, e)
    scan_time("entry build fwd (gather)", body_egf, payload0, ba_xs)

    # 4. entry build fwd+bwd (adds perm gather + cumsum + boundary diff)
    g_out0 = jnp.ones((f_pad, aux0.binn.sorted_gid.shape[0]), jnp.float32)
    def body_egb(payload, ba):
        e, vjp = jax.vjp(lambda q: build_pre(
            q, ba.binn.sorted_gid, ba.perm, ba.binn.gauss_offsets,
            ba.binn.gauss_counts, ba.binn.num_entries), payload)
        (gp,) = vjp(g_out0)
        return dep(payload, e[:, :128], gp)
    scan_time("entry build fwd+bwd (segsum)", body_egb, payload0, ba_xs)

    # 5/6. Pallas core forward / forward+backward
    feats_t0 = build_pre(payload0, aux0.binn.sorted_gid, aux0.perm,
                         aux0.binn.gauss_offsets, aux0.binn.gauss_counts,
                         aux0.binn.num_entries)
    core = R._make_core(0, rcfg.depth_mode, n_tx, n_ty)
    def body_core(ft, _):
        out = core(ft, aux0.binn.tile_starts, aux0.binn.tile_counts,
                   cam_vec)
        return dep(ft, out)
    scan_time("pallas core fwd", body_core, feats_t0)

    def body_coreb(ft, _):
        out, vjp = jax.vjp(
            lambda f: core(f, aux0.binn.tile_starts, aux0.binn.tile_counts,
                           cam_vec), ft)
        (gf,) = vjp(jnp.ones_like(out))
        return dep(ft, out[:1, :1, :1], gf[:1, :128])
    scan_time("pallas core fwd+bwd", body_coreb, feats_t0)

    # 7. full render forward (xs bin_aux)
    def body_rf(xyz, ba):
        st = state._replace(params=p._replace(xyz=xyz))
        out = render(st, cam, rcfg, bg, 3, scene_extent=4.0, bin_aux=ba)
        return dep(xyz, out["render"], out["depth"])
    scan_time("render fwd", body_rf, p.xyz, ba_xs)

    # 8. render fwd+bwd (L1 only)
    def body_rg(xyz, ba):
        def loss(v):
            st = state._replace(params=p._replace(xyz=v))
            out = render(st, cam, rcfg, bg, 3, scene_extent=4.0, bin_aux=ba)
            return jnp.mean(jnp.abs(out["render"] - cam.image))
        g = jax.grad(loss)(xyz)
        return dep(xyz, g)
    scan_time("render fwd+bwd (L1)", body_rg, p.xyz, ba_xs)

    # 9/10. full step_impl without / with the next-camera lookahead
    cfg = default_config()
    weights = {"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
               "depth_normal": 0.015, "l1_scale": 1.0}
    impl = _make_step_impl(cfg, rcfg, weights, 4.0, np.zeros(3, np.float32),
                           np.full(3, 4.0, np.float32), 0, None, None)
    net = NetState(None, None, None, None, None)
    gates = Gates(True, True, False, False, True)
    lr = jnp.asarray(1.6e-4)

    # 8b. render fwd+bwd, L1 only, grads wrt ALL gaussian params + dummy
    from vcr_gaus_tpu.train.trainer import compute_losses
    import vcr_gaus_tpu.utils.math as M

    inside_mask, _ = M.get_inside_normalized(
        p.xyz, jnp.zeros(3), jnp.full((3,), 4.0))

    def body_rg_all(params, ba):
        def loss(v, dummy):
            st = state._replace(params=v)
            out = render(st, cam, rcfg, bg, 3, scene_extent=4.0,
                         densify_dummy=dummy, bin_aux=ba)
            return jnp.mean(jnp.abs(out["render"] - cam.image))
        dummy = jnp.zeros((state.capacity, 2), jnp.float32)
        g, gd = jax.grad(loss, argnums=(0, 1))(params, dummy)
        return dep(params, gd, *jax.tree.leaves(g))
    scan_time("render fwd+bwd (L1, all params)", body_rg_all, p, ba_xs)

    # 8b2. grads wrt a chosen subset of params (isolate per-param backward)
    def make_body_subset(names):
        def body(params, ba):
            def loss(sub):
                v = params._replace(**sub)
                st = state._replace(params=v)
                out = render(st, cam, rcfg, bg, 3, scene_extent=4.0,
                             bin_aux=ba)
                return jnp.mean(jnp.abs(out["render"] - cam.image))
            g = jax.grad(loss)({k_: getattr(params, k_) for k_ in names})
            return dep(params, *jax.tree.leaves(g))
        return body
    for names in (("xyz",), ("logit_opacity",), ("f_dc",),
                  ("quat", "log_scale"),
                  ("xyz", "logit_opacity")):
        scan_time(f"render fwd+bwd grads={','.join(names)}",
                  make_body_subset(names), p, ba_xs)

    # 8c. render fwd+bwd, FULL loss stack, grads wrt all params + dummy
    def body_rg_full(params, ba):
        def loss(v, dummy):
            st = state._replace(params=v)
            out = render(st, cam, rcfg, bg, 3, scene_extent=4.0,
                         densify_dummy=dummy, bin_aux=ba)
            total, _ = compute_losses(out, cam, st, weights, gates, cfg,
                                      net, inside_mask, 0)
            return total
        dummy = jnp.zeros((state.capacity, 2), jnp.float32)
        g, gd = jax.grad(loss, argnums=(0, 1))(params, dummy)
        return dep(params, gd, *jax.tree.leaves(g))
    scan_time("render fwd+bwd (full loss)", body_rg_full, p, ba_xs)

    # 8d. Adam + densification stats from frozen grads
    g_fixed = jax.tree.map(lambda x: jnp.full_like(x, 1e-8), p)
    gd_fixed = jnp.zeros((state.capacity, 2), jnp.float32)
    radii_fixed = jnp.where(state.active, proj0.radius, 0)
    vis_fixed = state.active
    lrs_fixed = GM.LearningRates(
        xyz=lr, f_dc=cfg.optim.feature_lr,
        f_rest=cfg.optim.feature_lr / 20.0, opacity=cfg.optim.opacity_lr,
        scaling=cfg.optim.scaling_lr, rotation=cfg.optim.rotation_lr,
        obj_dc=cfg.optim.feature_lr)

    def body_adam(st, _):
        g_m = GM.mask_grads(g_fixed, st.active)
        st2 = GM.adam_step(st, g_m, lrs_fixed)
        st2 = GM.add_densification_stats(st2, gd_fixed, radii_fixed,
                                         vis_fixed)
        return st2
    scan_time("adam + densify stats", body_adam, state)

    def body_step(st, ba):
        st, _, losses, _ = impl(st, net, cam, bg, lr, sh_degree=3,
                                gates=gates, bin_aux=ba, next_cam=None)
        return dep(st, losses["total"])
    t_nolook = scan_time("train step (no lookahead)", body_step, state,
                         ba_xs)

    def body_full(carry, _):
        st, ba = carry
        st, _, losses, aux = impl(st, net, cam, bg, lr, sh_degree=3,
                                  gates=gates, bin_aux=ba, next_cam=cam)
        return dep((st, aux["next_bin_aux"]), losses["total"])
    t_full = scan_time("train step (full, carry bin_aux)", body_full,
                       (state, aux0))
    if t_full > 0:
        print(f"{'-> lookahead cost by difference':34s} "
              f"{t_full - t_nolook:7.2f} ms")
        print(f"{'-> full-step throughput':34s} {1e3 / t_full:7.1f} it/s")


if __name__ == "__main__":
    main()
