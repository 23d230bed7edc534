#!/usr/bin/env python
"""On-chip kernel validation: Pallas rasterizer vs the pure-JAX oracle.

The CPU test suite runs the Pallas kernels in interpreter mode, which
reproduces semantics but NOT Mosaic lowering (128-lane alignment, DMA
pipelining). This script is the real-hardware check: it renders small scenes
through BOTH the Pallas path (`rasterize_image`) and the brute-force oracle
(`rasterize_ref.composite_reference`) on the current default backend and
asserts channel-level agreement plus gradient agreement for every parameter
group. Run it after any kernel/lowering/binning change:

  PYTHONPATH=/root/repo python scripts/tpu_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(width, height, n, ch_sem, depth_mode, seed,
             check_grads=True):
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.ops import rasterize_ref as RREF

    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cap = max(128, 1 << int(np.ceil(np.log2(n))))
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=2, ch_sem=ch_sem)
    cam = Camera(colmap_id=0, idx=0, image_name="s", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=width,
                 height=height,
                 image=rng.uniform(0, 1, (3, height, width)
                                   ).astype(np.float32)).arrays()
    cam = jax.tree.map(jnp.asarray, cam)
    budget = 1 << 14
    bg = jnp.asarray([0.1, 0.2, 0.3])

    def channels(params):
        st = state._replace(params=params)
        p = st.params
        proj = PF.project_gaussians(
            p.xyz, st.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
            cam.tanfov[0], cam.tanfov[1], width, height, 1.0,
            opacity=st.opacity[:, 0])
        radius = jnp.where(st.active, proj.radius, 0)
        rgb = jnp.abs(jnp.sin(p.f_dc[:, 0, :] * 3.0))          # simple head
        nrm = st.shortest_axis_normal()
        sem = p.obj_dc[:, 0, :] if ch_sem else None
        feats = PF.pack_features(proj, st.opacity[:, 0], rgb, nrm, sem,
                                 ch_sem)
        cam_vec = jnp.concatenate([cam.intr, bg, jnp.zeros((1,))]
                                  ).astype(jnp.float32)
        dummy = jnp.zeros((p.xyz.shape[0], 2), jnp.float32)
        img, _ = R.rasterize_image(feats, dummy, proj.mean2d, radius,
                                   proj.depth_z, cam_vec, width, height,
                                   ch_sem, depth_mode, budget,
                                   extents=proj.ext)
        oracle = RREF.composite_reference(
            feats, RREF.depth_order(proj.depth_z, radius), height, width,
            bg, ch_sem, depth_mode, cam.intr)
        return img, oracle

    img, oracle = jax.jit(channels)(state.params)
    img, oracle = np.asarray(img), np.asarray(oracle)
    assert np.isfinite(img).all(), "pallas output has non-finite pixels"
    # per-channel relative error: on real hardware the MXU transmittance
    # matmul rounds differently from the oracle's sequential cumprod, so
    # tolerances are relative to each channel's scale (depth^2 ~ d^2)
    scale = np.maximum(np.abs(oracle).reshape(oracle.shape[0], -1
                                              ).max(axis=1), 1e-3)
    rel = (np.abs(img - oracle).reshape(img.shape[0], -1)
           / scale[:, None])
    err_max = rel.max(axis=1)       # worst pixel per channel
    err_mean = rel.mean(axis=1)     # bulk agreement per channel
    alpha_cov = (img[8] > 0.01).mean()
    print(f"  fwd  rel err max={err_max.max():.3e} mean={err_mean.max():.3e}"
          f" (rgb {err_max[:3].max():.1e} nrm {err_max[3:6].max():.1e} "
          f"d {err_max[6]:.1e} d2 {err_max[7]:.1e} a {err_max[8]:.1e}"
          f"{' sem %.1e' % err_max[9:].max() if ch_sem else ''})  "
          f"alpha>1% on {100*alpha_cov:.0f}% of pixels")
    # Lowering bugs produce gross (order-unity, image-wide) mismatches. A
    # handful of edge pixels legitimately differ from the oracle on real
    # hardware: depth-key ties compose in a different order, and the
    # intersection depth's +-1e-2 ray.normal clamp amplifies hw rsqrt
    # rounding ~100x near tangency. So: tight bound on the per-channel MEAN,
    # loose bound on the worst pixel.
    assert err_mean.max() < 2e-3, f"bulk forward mismatch {err_mean}"
    assert err_max.max() < 5e-2, f"gross forward mismatch {err_max}"
    assert alpha_cov > 0.05, "scene did not cover the image"

    # gradient agreement through an L1+depth objective
    tgt = jnp.asarray(np.asarray(cam.image))

    def loss_pallas(params):
        img, _ = channels(params)
        return (jnp.mean(jnp.abs(img[0:3] - tgt)) + 0.1 * jnp.mean(img[6])
                + 0.05 * jnp.mean(img[3:6]))

    def loss_oracle(params):
        _, oracle = channels(params)
        return (jnp.mean(jnp.abs(oracle[0:3] - tgt))
                + 0.1 * jnp.mean(oracle[6]) + 0.05 * jnp.mean(oracle[3:6]))

    gp = jax.jit(jax.grad(loss_pallas))(state.params)
    if not check_grads:
        # the O(N*P) oracle's autodiff graph OOMs the compile service at
        # this size — pallas-grad sanity only
        for name in ("xyz", "log_scale", "quat", "logit_opacity", "f_dc"):
            a = np.asarray(getattr(gp, name))
            assert np.isfinite(a).all(), f"grad {name} non-finite"
            assert np.abs(a).max() > 0, f"grad {name} identically zero"
        print("  grads finite+nonzero (oracle comparison skipped: size)")
        return
    go = jax.jit(jax.grad(loss_oracle))(state.params)
    g_tol = 5e-2 if depth_mode == "intersection" else 2e-2
    for name in ("xyz", "log_scale", "quat", "logit_opacity", "f_dc"):
        a, b = np.asarray(getattr(gp, name)), np.asarray(getattr(go, name))
        assert np.isfinite(a).all(), f"grad {name} non-finite"
        denom = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        nz = np.abs(a).max()
        print(f"  grad {name:14s} rel_err={rel:.3e} max|g|={nz:.3e}")
        assert rel < g_tol, f"grad mismatch on {name}: {rel}"
        assert nz > 0, f"grad {name} identically zero"


def run_stats_case(width=64, height=48, n=150, seed=5):
    """On-chip check of the stats kernel (count/importance — the f_count
    render modes feeding LightGaussian pruning): compare the summed
    blending weights against the brute-force oracle's weights."""
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize as R
    from vcr_gaus_tpu.ops import rasterize_ref as RREF

    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, 256, sh_degree=2)
    cam = Camera(colmap_id=0, idx=0, image_name="s", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=width,
                 height=height,
                 image=rng.uniform(0, 1, (3, height, width)
                                   ).astype(np.float32)).arrays()
    cam = jax.tree.map(jnp.asarray, cam)

    def stats(params):
        st = state._replace(params=params)
        p = st.params
        proj = PF.project_gaussians(
            p.xyz, st.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
            cam.tanfov[0], cam.tanfov[1], width, height, 1.0,
            opacity=st.opacity[:, 0])
        radius = jnp.where(st.active, proj.radius, 0)
        rgb = jnp.abs(jnp.sin(p.f_dc[:, 0, :] * 3.0))
        feats = PF.pack_features(proj, st.opacity[:, 0], rgb, None, None, 0)
        cam_vec = jnp.concatenate([cam.intr, jnp.zeros(3), jnp.zeros((1,))]
                                  ).astype(jnp.float32)
        count, imp = R.rasterize_entry_stats(
            feats, proj.mean2d, radius, proj.depth_z, cam_vec, width,
            height, 0, 1 << 13, extents=proj.ext)
        # oracle weights: alpha * exclusive transmittance, summed per
        # gaussian over all pixels (tools/prune.py importance semantics)
        order = RREF.depth_order(proj.depth_z, radius)
        f = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))],
                            0)[order]
        ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                              jnp.arange(width, dtype=jnp.float32),
                              indexing="ij")
        dx = xs.reshape(-1, 1) - f[None, :, PF.F_MEAN_X]
        dy = ys.reshape(-1, 1) - f[None, :, PF.F_MEAN_Y]
        A, Bc, C = (f[:, PF.F_CONIC_A], f[:, PF.F_CONIC_B],
                    f[:, PF.F_CONIC_C])
        power = (-0.5 * (A[None] * dx * dx + C[None] * dy * dy)
                 - Bc[None] * dx * dy)
        alpha = f[None, :, PF.F_OPACITY] * jnp.exp(power)
        alpha = jnp.where(power > 0, 0.0, alpha)
        alpha = jnp.where(alpha < RREF.ALPHA_EPS, 0.0,
                          jnp.minimum(alpha, RREF.ALPHA_CAP))
        cum = jnp.cumprod(1.0 - alpha, axis=1)
        trans_excl = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], 1)
        w = (alpha * trans_excl).sum(0)
        imp_ref = jnp.zeros((state.capacity + 1,)).at[order].add(w)
        return count, imp, imp_ref[:state.capacity]

    count, imp, imp_ref = jax.jit(stats)(state.params)
    count, imp, imp_ref = map(np.asarray, (count, imp, imp_ref))
    assert np.isfinite(count).all() and np.isfinite(imp).all()
    scale = max(imp_ref.max(), 1e-3)
    rel = np.abs(imp - imp_ref).max() / scale
    print(f"  stats importance rel_err={rel:.3e} "
          f"max count={count.max():.0f} total imp={imp.sum():.1f}")
    assert rel < 2e-2, f"stats importance mismatch {rel}"
    assert count.max() > 0 and imp.sum() > 0


def main():
    import jax

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    cache = enable_compilation_cache()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}  "
          f"compile cache: {cache}")
    cases = [
        ("64x48 traditional", 64, 48, 200, 0, "traditional", 0, True),
        ("64x48 intersection", 64, 48, 200, 0, "intersection", 1, True),
        ("100x70 ragged+sem", 100, 70, 300, 4, "intersection", 2, True),
        ("257x129 odd tiles", 257, 129, 400, 0, "intersection", 3, False),
    ]
    for name, w, h, n, s, dm, seed, cg in cases:
        print(f"[{name}]")
        run_case(w, h, n, s, dm, seed, check_grads=cg)
    print("[stats kernel]")
    run_stats_case()
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
