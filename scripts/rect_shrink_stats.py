#!/usr/bin/env python
"""Measure the entry-count savings available from tightening the binning
rects to the true ellipse-tile coverage (VERDICT r4 next #2a), BEFORE
building anything: on a TRAINED population (anisotropic, normal-flattened
splats — the regime VCR-GauS produces) and on the synthetic bench shell.

Three coverage models per gaussian, tile-exact:
  rect   — current: AABB of the alpha>=1/255 ellipse (span_w x span_h)
  band-R — AABB split into R horizontal tile-row bands, each with its own
           tight x-range (expressible as R separable MXU histogram terms +
           a scatter-free R-step slot decode — the implementable scheme)
  exact  — ellipse-vs-tile-box intersection (lower bound; NOT separable)

  python scripts/rect_shrink_stats.py --cfg /tmp/vcr_trainpop/run/config.yaml
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def ellipse_box_intersects(A, B, C, L, xa, xb, ya, yb):
    """Vectorized: does {0.5(A dx^2 + 2B dx dy + C dy^2) <= L} intersect the
    box [xa,xb]x[ya,yb] (coords relative to the ellipse center)? Minimum of
    the positive-definite quadratic over the box, via interior check + the
    four 1-D edge minimizations (exact for PD quadratics on a box)."""

    def q(dx, dy):
        return 0.5 * (A * dx * dx + 2 * B * dx * dy + C * dy * dy)

    inside = (xa <= 0) & (0 <= xb) & (ya <= 0) & (0 <= yb)
    best = np.full(A.shape, np.inf)
    # vertical edges dx = xa / xb: optimal dy = -B dx / C, clamped
    for dx in (xa, xb):
        dy = np.clip(-B * dx / C, ya, yb)
        best = np.minimum(best, q(dx, dy))
    # horizontal edges dy = ya / yb: optimal dx = -B dy / A, clamped
    for dy in (ya, yb):
        dx = np.clip(-B * dy / A, xa, xb)
        best = np.minimum(best, q(dx, dy))
    return inside | (best <= L)


def coverage_counts(mean2d, conic, lvl, ext, tile, n_tx, n_ty, bands_list,
                    max_span=96):
    """Entry counts per coverage model. Iterates tile offsets within each
    rect, vectorized over gaussians."""
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    mx, my = mean2d[:, 0], mean2d[:, 1]
    rx, ry = ext[:, 0], ext[:, 1]
    alive = (rx > 0) & (ry > 0)
    x0 = np.clip(((mx - rx) / tile).astype(np.int64), 0, n_tx)
    y0 = np.clip(((my - ry) / tile).astype(np.int64), 0, n_ty)
    x1 = np.clip(((mx + rx + tile - 1) / tile).astype(np.int64), 0, n_tx)
    y1 = np.clip(((my + ry + tile - 1) / tile).astype(np.int64), 0, n_ty)
    sw = np.where(alive, np.maximum(x1 - x0, 0), 0)
    sh = np.where(alive, np.maximum(y1 - y0, 0), 0)
    e_rect = int((sw * sh).sum())

    wide = (sw > max_span) | (sh > max_span)
    n_wide = int(wide.sum())

    # exact per-tile test, vectorized over gaussians per (dy, dx) offset
    e_exact = int((sw * sh)[wide].sum())   # wide splats: count as rect
    sel = alive & ~wide & (sw > 0) & (sh > 0)
    idx = np.nonzero(sel)[0]
    Ai, Bi, Ci, Li = A[idx], B[idx], C[idx], lvl[idx]
    mxi, myi = mx[idx], my[idx]
    x0i, y0i, swi, shi = x0[idx], y0[idx], sw[idx], sh[idx]
    smax_w, smax_h = int(swi.max(initial=0)), int(shi.max(initial=0))
    nsel = len(idx)
    hit_total = np.zeros(nsel, np.int64)
    # per-(gaussian, band) hit-column min/max, accumulated on the fly:
    # band b of R covers the gaussian's rect rows [b*sh/R, (b+1)*sh/R)
    BIG = 1 << 30
    bmin = {R: np.full((R, nsel), BIG, np.int64) for R in bands_list}
    bmax = {R: np.full((R, nsel), -1, np.int64) for R in bands_list}
    for dy in range(smax_h):
        rowy = y0i + dy
        row_ok = dy < shi
        ya = rowy * tile - myi
        yb = (rowy + 1) * tile - myi
        col_hit = np.zeros((smax_w, nsel), bool)
        for dx in range(smax_w):
            colx = x0i + dx
            ok = row_ok & (dx < swi)
            xa = colx * tile - mxi
            xb = (colx + 1) * tile - mxi
            col_hit[dx] = ok & ellipse_box_intersects(Ai, Bi, Ci, Li,
                                                     xa, xb, ya, yb)
        hit_total += col_hit.sum(0)
        has = col_hit.any(0)
        first = np.where(has, np.argmax(col_hit, axis=0), BIG)
        last = np.where(has, smax_w - 1 - np.argmax(col_hit[::-1], axis=0),
                        -1)
        for R in bands_list:
            # band of row dy must match the [lo, hi) partition used in the
            # counting loop: b = #{bb >= 1 : dy >= (shi*bb)//R}
            b = np.zeros(nsel, np.int64)
            for bb in range(1, R):
                b += (dy >= (shi * bb) // R).astype(np.int64)
            for bb in range(R):
                m = row_ok & (b == bb)
                bmin[R][bb] = np.where(m, np.minimum(bmin[R][bb], first),
                                       bmin[R][bb])
                bmax[R][bb] = np.where(m, np.maximum(bmax[R][bb], last),
                                       bmax[R][bb])
    e_exact += int(hit_total.sum())

    # band model: each band's conservative x-range is the contiguous
    # [min hit col, max hit col] over its rows x the band's row count —
    # exactly what a separable R-term histogram implementation would emit
    e_bands = {}
    for R in bands_list:
        tot = np.zeros(nsel, np.int64)
        for bb in range(R):
            lo = (shi * bb) // R
            hi = np.maximum((shi * (bb + 1)) // R, lo)   # exclusive
            width = np.where(bmax[R][bb] >= 0,
                             bmax[R][bb] - np.minimum(bmin[R][bb], BIG - 1)
                             + 1, 0)
            tot += width * (hi - lo)
        e_bands[R] = int(tot.sum()) + int((sw * sh)[wide].sum())
    return e_rect, e_exact, e_bands, n_wide


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="/tmp/vcr_trainpop/run/config.yaml")
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--n_cams", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.data.scene import load_scene_info
    from vcr_gaus_tpu.models import ply_io
    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops.binning import tile_grid
    from depth2mesh import latest_iteration

    out = {"tile": args.tile, "cases": []}

    def run_case(name, state, cams, width, height):
        from vcr_gaus_tpu.models import gaussians as GM
        n_tx, n_ty = tile_grid(width, height, args.tile)
        for ci, cam in enumerate(cams):
            proj = jax.jit(lambda st, c: PF.project_gaussians(
                st.params.xyz, st.scaling, st.params.quat, c.viewmatrix,
                c.projmatrix, c.tanfov[0], c.tanfov[1], width, height, 1.0,
                opacity=st.opacity[:, 0]))(state, cam)
            act = np.asarray(state.active)
            mean2d = np.asarray(proj.mean2d, np.float64)
            conic = np.asarray(proj.conic, np.float64)
            op = np.asarray(state.opacity[:, 0], np.float64)
            lvl = np.clip(np.log(255.0 * np.maximum(op, 1e-12)), 0.0, 4.5)
            ext = np.asarray(proj.ext, np.float64)
            rad = np.asarray(proj.radius)
            ext = np.where((act & (rad > 0))[:, None], ext, 0.0)
            e_rect, e_exact, e_bands, n_wide = coverage_counts(
                mean2d, conic, lvl, ext, args.tile, n_tx, n_ty, [2, 4, 8])
            row = {"case": name, "cam": ci, "e_rect": e_rect,
                   "e_exact": e_exact,
                   "exact_over_rect": round(e_exact / max(e_rect, 1), 4),
                   "n_wide_excluded": n_wide}
            for R, v in e_bands.items():
                row[f"e_band{R}"] = v
                row[f"band{R}_over_rect"] = round(v / max(e_rect, 1), 4)
            out["cases"].append(row)
            print(json.dumps(row), flush=True)

    # trained population
    if os.path.exists(args.cfg):
        tcfg = Config(args.cfg)
        logdir = os.path.dirname(os.path.abspath(args.cfg))
        it = latest_iteration(logdir)
        ply = os.path.join(logdir, "point_cloud", f"iteration_{it}",
                           "point_cloud.ply")
        state = ply_io.load_gaussian_ply(ply, max_sh_degree=3)
        info = load_scene_info(tcfg.model.source_path,
                               resolution=tcfg.model.resolution)
        cams = [jax.tree.map(jnp.asarray, c.arrays(pixels=False))
                for c in info.train_cameras[:args.n_cams]]
        c0 = info.train_cameras[0]
        run_case("trained_trainpop", state, cams, c0.width, c0.height)

    # synthetic dtu_full shell (the bench population)
    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    rng = np.random.default_rng(0)
    n_g = 200_000            # 1/5 of the bench count: CPU-tractable, same
    theta = rng.uniform(0, 2 * np.pi, n_g)          # per-splat statistics
    z = rng.uniform(-1, 1, n_g)
    r = np.sqrt(1 - z ** 2)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   1).astype(np.float32) * 1.5 + np.array([0, 0, 4.0],
                                                          np.float32)
    cols = rng.uniform(0, 1, (n_g, 3)).astype(np.float32)
    st = GM.create_from_pcd(pts, cols, 1 << 18, sh_degree=3)
    st = st._replace(params=st.params._replace(
        log_scale=st.params.log_scale + np.float32(np.log(4.0))))
    cam = Camera(colmap_id=0, idx=0, image_name="b0", R=np.eye(3),
                 T=np.array([0.3, 0.0, 0.0]), fovx=0.9, fovy=0.7,
                 width=1600, height=1200,
                 image=np.zeros((3, 1200, 1600), np.float32)).arrays()
    cam = jax.tree.map(jnp.asarray, cam)
    run_case("synthetic_shell_200k", st, [cam], 1600, 1200)

    with open(os.path.join(REPO, "artifacts_r05", "rect_shrink_stats.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
