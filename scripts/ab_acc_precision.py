#!/usr/bin/env python
"""Interleaved same-window A/B of the accumulation-matmul precision
(VERDICT r3 next #3).

Round 3's final snapshot set Precision.HIGHEST on three PLAIN weighted
accumulations (forward `dacc`, backward `s` + `gfeat_acc`,
ops/rasterize_tpu.py) without an A/B — the numerics doctrine reserves
HIGHEST for matmuls feeding cancellations (the log-transmittance
cumsum/suffix sums, which stay HIGHEST regardless of this knob). This
script decides with evidence, at the protocol shape where the kernel pair
dominates the step:

  1. timing: scan-based core fwd / fwd+bwd, alternating HIGHEST and
     DEFAULT inside one session (the tunnel drifts +-20% across hours —
     only interleaved rows are comparable);
  2. numerics: max relative divergence of the forward image and the
     per-entry gradients between the two settings. A plain accumulation
     diverges by ~the bf16 input truncation (~4e-3 relative); a fed
     cancellation blows up by orders of magnitude (the failure mode that
     justified HIGHEST on the cumsums).

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/ab_acc_precision.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--w", type=int, default=1600)
    ap.add_argument("--h", type=int, default=1200)
    ap.add_argument("--budget", type=int, default=4325376)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--scale_mult", type=float, default=4.0)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3, help="A/B alternations")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import binning as B
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.ops import rasterize_tpu as K
    from vcr_gaus_tpu.render import renderer as RR
    from vcr_gaus_tpu.render.renderer import RenderConfig

    K.set_tile(args.tile)
    rng = np.random.default_rng(0)
    n = args.n
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    r = np.sqrt(1 - z ** 2)
    pts = (np.stack([r * np.cos(theta), r * np.sin(theta), z], 1) * 1.5
           + np.array([0, 0, 4.0])).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, args.cap, sh_degree=3)
    if args.scale_mult != 1.0:
        state = state._replace(params=state.params._replace(
            log_scale=state.params.log_scale
            + np.float32(np.log(args.scale_mult))))
    img = rng.uniform(0, 1, (3, args.h, args.w)).astype(np.float32)
    cam = Camera(colmap_id=0, idx=0, image_name="p", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=args.w,
                 height=args.h, image=img).arrays()
    cam = jax.tree.map(jnp.asarray, cam)
    rcfg = RenderConfig(width=args.w, height=args.h, ch_sem=0,
                        depth_mode="intersection",
                        entry_budget=args.budget, mask_depth_thr=0.8)
    aux0 = jax.jit(lambda st: RR.compute_camera_binning(st, cam, rcfg)
                   )(state)
    f_pad = K.feat_rows(0)
    payload0 = jnp.asarray(
        rng.normal(size=(f_pad, args.cap)).astype(np.float32))
    build_pre = R._make_entry_builder_pre(args.budget)
    feats_t0 = jax.jit(lambda p: build_pre(
        p, aux0.binn.sorted_gid, aux0.perm, aux0.binn.gauss_offsets,
        aux0.binn.gauss_counts, aux0.binn.num_entries))(payload0)
    n_tx, n_ty = B.tile_grid(args.w, args.h, K.TILE)
    cam_vec = jnp.concatenate([cam.intr, jnp.zeros(3), jnp.zeros((1,))]
                              ).astype(jnp.float32)
    kk, iters = args.k, args.iters
    EPS = 1e-20

    def make_runs(label):
        """Build + compile (fwd_timed, bwd_timed, fwd_out, bwd_grad) under
        the CURRENT ACC_PRECISION (trace happens now)."""
        core = R._make_core(0, rcfg.depth_mode, n_tx, n_ty)
        ts, tc = aux0.binn.tile_starts, aux0.binn.tile_counts

        @jax.jit
        def fwd_timed(ft):
            def body(c, _):
                out = core(c, ts, tc, cam_vec)
                s = jnp.sum(out).astype(jnp.float32)
                return c + (EPS * s).astype(c.dtype), 0.0
            c, _ = jax.lax.scan(body, ft, None, length=kk)
            return jnp.sum(c)

        @jax.jit
        def bwd_timed(ft):
            def body(c, _):
                out, vjp = jax.vjp(lambda f: core(f, ts, tc, cam_vec), c)
                (gf,) = vjp(jnp.ones_like(out))
                s = (jnp.sum(out[:1, :1, :1]) + jnp.sum(gf[:1, :128]))
                return c + (EPS * s).astype(c.dtype), 0.0
            c, _ = jax.lax.scan(body, ft, None, length=kk)
            return jnp.sum(c)

        @jax.jit
        def fwd_out(ft):
            return core(ft, ts, tc, cam_vec)

        @jax.jit
        def bwd_grad(ft):
            out, vjp = jax.vjp(lambda f: core(f, ts, tc, cam_vec), ft)
            (gf,) = vjp(jnp.ones_like(out))
            return gf

        t0 = time.time()
        _ = float(fwd_timed(feats_t0))
        _ = float(bwd_timed(feats_t0))
        fwd_out(feats_t0).block_until_ready()
        bwd_grad(feats_t0).block_until_ready()
        print(f"[{label}] compiled in {time.time() - t0:.0f}s", flush=True)
        return fwd_timed, bwd_timed, fwd_out, bwd_grad

    HIGH = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    K.set_acc_precision(HIGH)
    runs_h = make_runs("HIGHEST")
    K.set_acc_precision(DEF)
    runs_d = make_runs("DEFAULT")

    def t_ms(fn):
        s = fn(feats_t0)
        _ = float(s)
        t0 = time.time()
        for _i in range(iters):
            s = fn(feats_t0)
        _ = float(s)
        return (time.time() - t0) / (iters * kk) * 1e3

    rows = {"fwd_H": [], "fwd_D": [], "bwd_H": [], "bwd_D": []}
    for rep in range(args.reps):
        rows["fwd_H"].append(t_ms(runs_h[0]))
        rows["fwd_D"].append(t_ms(runs_d[0]))
        rows["bwd_H"].append(t_ms(runs_h[1]))
        rows["bwd_D"].append(t_ms(runs_d[1]))
        print({k: [round(v, 2) for v in vs] for k, vs in rows.items()},
              flush=True)

    # ---- numerics: H vs D divergence (in-graph reductions, scalar fetch)
    out_h = runs_h[2](feats_t0)
    out_d = runs_d[2](feats_t0)
    g_h = runs_h[3](feats_t0)
    g_d = runs_d[3](feats_t0)

    @jax.jit
    def rel_stats(a, b):
        d = jnp.abs(a - b)
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
        denom = jnp.maximum(jnp.abs(a), 1e-3 * scale)
        return jnp.max(d) / scale, jnp.max(d / denom)

    f_absmax, f_relmax = (float(x) for x in rel_stats(out_h, out_d))
    g_absmax, g_relmax = (float(x) for x in rel_stats(g_h, g_d))

    med = lambda v: float(np.median(v))
    result = {
        "shape": f"{args.n}g {args.w}x{args.h} tile{args.tile} "
                 f"budget {args.budget}",
        "fwd_ms": {"HIGHEST": med(rows["fwd_H"]), "DEFAULT": med(rows["fwd_D"])},
        "bwd_ms": {"HIGHEST": med(rows["bwd_H"]), "DEFAULT": med(rows["bwd_D"])},
        "all_rows_ms": {k: [round(v, 2) for v in vs]
                        for k, vs in rows.items()},
        "fwd_div": {"max_abs_over_scale": f_absmax, "max_rel": f_relmax},
        "grad_div": {"max_abs_over_scale": g_absmax, "max_rel": g_relmax},
    }
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
