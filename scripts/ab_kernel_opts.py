#!/usr/bin/env python
"""Interleaved same-window A/B of kernel-pair variants at the protocol
shape (round-4 optimization campaign; VERDICT r3 next #1b).

Variants are (ACC_PRECISION, TRI_PRECISION) combos and any trace-time
kernel toggles registered below. All variants compile up front, then timing
rows alternate round-robin inside one session (the tunnel drifts +-20%
across hours — only interleaved rows are comparable). Numerics: max
divergence of forward image + per-entry grads vs the `base` variant.

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u \
      scripts/ab_kernel_opts.py [--variants base,tri_high,all_high]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", type=str, default="base,tri_3x")
    ap.add_argument("--payload", choices=("real", "noise"), default="real",
                    help="feature payload: real packed projection features "
                         "(honest early-termination workload) or the "
                         "pre-r4 noise rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import binning as B
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.ops import rasterize_tpu as K
    from vcr_gaus_tpu.render import renderer as RR
    from vcr_gaus_tpu.render.renderer import RenderConfig

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    VARIANTS = {
        "base": dict(acc=HI, tri=HI),
        # manual 3-pass bf16 split for the triangular sums (Mosaic rejects
        # Precision.HIGH; the 0/1 operand is bf16-exact so 3x == full f32)
        "tri_3x": dict(acc=HI, tri="3x"),
        # 1-pass bf16 on the accumulation matmuls (numerics reference point)
        "acc_default": dict(acc=DEF, tri=HI),
        # DMA/compute chunk size (base G=256); larger chunks amortize the
        # ~2us/chunk fixed cost, coarsen padding + early termination
        "g128": dict(acc=HI, tri=HI, chunk=128),
        "g384": dict(acc=HI, tri=HI, chunk=384),
        "g512": dict(acc=HI, tri=HI, chunk=512),
        # termination-consensus granularity (base STRIP_ROWS=0 since the
        # r5 A/B flipped the default — strips lost 5.7% end-to-end). Run
        # with --payload real — termination depends on actual opacities.
        "strip0": dict(acc=HI, tri=HI, strip=0),
        "strip128": dict(acc=HI, tri=HI, strip=128),
    }
    names = [v for v in args.variants.split(",") if v]

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
    aux0 = jax.jit(lambda st: RR.compute_camera_binning(st, cam, rcfg))(state)
    f_pad = K.feat_rows(0)
    if args.payload == "real":
        # the real packed features: early termination (and therefore the
        # strip-consensus variants) depends on actual opacities/conics —
        # noise features misrepresent the compositing workload
        from vcr_gaus_tpu.ops import projection as PF

        @jax.jit
        def _pack(st):
            p = st.params
            proj = PF.project_gaussians(
                p.xyz, st.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
                cam.tanfov[0], cam.tanfov[1], args.w, args.h, 1.0,
                opacity=st.opacity[:, 0])
            rgbv = jnp.ones((p.xyz.shape[0], 3), jnp.float32) * 0.5
            nrm = proj.mean_cam / jnp.maximum(
                jnp.linalg.norm(proj.mean_cam, axis=-1, keepdims=True), 1e-6)
            feats = PF.pack_features(proj, st.opacity[:, 0], rgbv, -nrm,
                                     None, 0)
            pad = f_pad - feats.shape[1] - 2
            rows = [feats.T, jnp.zeros((2, feats.shape[0]))]
            if pad:
                rows.append(jnp.zeros((pad, feats.shape[0])))
            return jnp.concatenate(rows, axis=0)
        payload0 = _pack(state)
    else:
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

        # numerics comparand: PER-GAUSSIAN grads through the production
        # segment-sum (the raw (F_PAD, E_pad) kernel output contains
        # uninitialized slack outside the written tile regions — comparing
        # it directly reads garbage and once produced a spurious '37%
        # divergence' that was byte-identical across unrelated A/Bs)
        @jax.jit
        def bwd_grad(p):
            def loss(pp):
                ft = build_pre(pp, aux0.binn.sorted_gid, aux0.perm,
                               aux0.binn.gauss_offsets,
                               aux0.binn.gauss_counts,
                               aux0.binn.num_entries)
                out = core(ft, ts, tc, cam_vec)
                return jnp.sum(out * out)     # smooth, covers all channels
            return jax.grad(loss)(p)

        t0 = time.time()
        _ = float(fwd_timed(feats_t0))
        _ = float(bwd_timed(feats_t0))
        fwd_out(feats_t0).block_until_ready()
        bwd_grad(payload0).block_until_ready()
        print(f"[{label}] compiled in {time.time() - t0:.0f}s", flush=True)
        return fwd_timed, bwd_timed, fwd_out, bwd_grad

    runs = {}
    for name in names:
        v = VARIANTS[name]
        K.set_acc_precision(v["acc"], tri=v["tri"])
        K.set_chunk(v.get("chunk", 256))
        K.set_strip_rows(v.get("strip", 128))
        runs[name] = make_runs(name)
    # restore defaults so a crash doesn't leave globals dirty
    K.set_acc_precision(HI, tri=HI)
    K.set_chunk(256)
    K.set_strip_rows(128)

    def t_ms(fn):
        s = fn(feats_t0)
        _ = float(s)
        t0 = time.time()
        for _i in range(iters):
            s = fn(feats_t0)
        _ = float(s)
        return (time.time() - t0) / (iters * kk) * 1e3

    rows = {f"{w}_{name}": [] for name in names for w in ("fwd", "bwd")}
    for rep in range(args.reps):
        for name in names:
            rows[f"fwd_{name}"].append(t_ms(runs[name][0]))
        for name in names:
            rows[f"bwd_{name}"].append(t_ms(runs[name][1]))
        print({k: [round(v, 2) for v in vs] for k, vs in rows.items()},
              flush=True)

    @jax.jit
    def rel_stats(a, b):
        d = jnp.abs(a - b)
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
        denom = jnp.maximum(jnp.abs(a), 1e-3 * scale)
        return jnp.max(d) / scale, jnp.max(d / denom)

    base_name = names[0]
    out_b = runs[base_name][2](feats_t0)
    g_b = runs[base_name][3](payload0)
    div = {}
    for name in names[1:]:
        f_abs, f_rel = (float(x) for x in
                        rel_stats(out_b, runs[name][2](feats_t0)))
        g_abs, g_rel = (float(x) for x in
                        rel_stats(g_b, runs[name][3](payload0)))
        div[name] = {"fwd_max_abs_over_scale": f_abs, "fwd_max_rel": f_rel,
                     "grad_max_abs_over_scale": g_abs, "grad_max_rel": g_rel}

    med = lambda v: float(np.median(v))
    result = {
        "shape": f"{args.n}g {args.w}x{args.h} tile{args.tile} "
                 f"budget {args.budget}",
        "fwd_ms": {name: med(rows[f"fwd_{name}"]) for name in names},
        "bwd_ms": {name: med(rows[f"bwd_{name}"]) for name in names},
        "all_rows_ms": {k: [round(v, 2) for v in vs]
                        for k, vs in rows.items()},
        "divergence_vs_" + base_name: div,
    }
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
