#!/usr/bin/env python
"""Interleaved same-window protocol-shape A/B of the kernel knobs
(VERDICT r4 next #1b / #2b): strip-granular termination (0 vs 128) x
G-chunk (256 vs 512) on the dtu_full synthetic population.

The tunnel drifts +-20% across hours, so ONLY interleaved same-window
comparisons are valid (CLAUDE.md). Each variant is traced+compiled on its
first pass (persistent compile cache makes pass 2 cheap), then all
variants are re-timed round-robin; the report keeps per-pass rows so
drift is visible.

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/ab_protocol_r05.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

STEPS_PER_CALL = 10
WARMUP = 2          # supersteps per variant before each timed window
TIMED = 5           # timed supersteps per pass
PASSES = 3          # round-robin passes (pass 0 pays compiles; report all)

VARIANTS = [
    ("strip128_g256", 128, 256),
    ("strip0_g256", 0, 256),
    ("strip128_g512", 128, 512),
    ("strip0_g512", 0, 512),
]


def main():
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.ops import rasterize_tpu as K
    K.set_tile(32)

    from vcr_gaus_tpu.config import default_config
    from vcr_gaus_tpu.data.cameras import Camera
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.render.renderer import (RenderConfig,
                                              compute_camera_binning)
    from vcr_gaus_tpu.train.trainer import (Gates, NetState,
                                            make_multi_train_step)

    n_gauss, cap = 1_000_000, 1 << 20
    width, height = 1600, 1200
    k = STEPS_PER_CALL
    rng = np.random.default_rng(0)

    # dtu_full synthetic population (bench.py): sphere shell, scales 4x
    theta = rng.uniform(0, 2 * np.pi, n_gauss)
    z = rng.uniform(-1, 1, n_gauss)
    r = np.sqrt(1 - z ** 2)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z],
                   1).astype(np.float32)
    pts = pts * 1.5 + np.array([0, 0, 4.0], np.float32)
    cols = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    state0 = GM.create_from_pcd(pts, cols, cap, sh_degree=3)
    state0 = state0._replace(params=state0.params._replace(
        log_scale=state0.params.log_scale + np.float32(np.log(4.0))))

    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        img = rng.uniform(0, 1, (3, height, width)).astype(np.float32)
        nrm = rng.normal(size=(3, height, width)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
        cams.append(Camera(
            colmap_id=i, idx=i, image_name=f"b{i}",
            R=np.eye(3), T=np.array([0.3 * np.cos(ang),
                                     0.3 * np.sin(ang), 0.0]),
            fovx=0.9, fovy=0.7, width=width, height=height,
            image=img, normal=nrm).arrays())
    cams = [jax.tree.map(jnp.asarray, c) for c in cams]

    cfg = default_config()
    weights = {"l1": 0.8, "ssim": 0.2, "mono_normal": 0.01,
               "l1_scale": 0.5, "consistent_normal": 0.05,
               "distortion": 1000.0}

    # probe entry demand once (knob-independent at fixed tile)
    probe_rcfg = RenderConfig(width=width, height=height, ch_sem=0,
                              depth_mode="intersection", entry_budget=1 << 14)
    probe = jax.jit(lambda st, cam: compute_camera_binning(
        st, cam, probe_rcfg).binn.num_entries)
    peak_entries = max(int(probe(state0, c)) for c in cams)
    q = 1 << 16
    entry_budget = max(q, -(-(peak_entries * 5 // 4) // q) * q)
    print(f"probe: peak_entries={peak_entries} -> budget={entry_budget}",
          file=sys.stderr)

    rcfg = RenderConfig(width=width, height=height, ch_sem=0,
                        depth_mode="intersection", entry_budget=entry_budget,
                        mask_depth_thr=0.0)

    net = NetState(None, None, None, None, None)
    gates = Gates(True, True, False, True, True)
    bgs = jnp.zeros((k, 3))
    lrs = jnp.full((k,), 1.6e-4, jnp.float32)

    def batch(s):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[cams[(s * k + j) % 8] for j in range(k)])

    batches = [batch(s) for s in range(4)]

    step_fns = {}

    def run_variant(name, strip, chunk):
        K.set_strip_rows(strip)
        K.set_chunk(chunk)
        if name not in step_fns:
            step_fns[name] = make_multi_train_step(
                cfg, rcfg, weights, 4.0, np.zeros(3, np.float32),
                np.full(3, 4.0, np.float32), 0, None, None, k=k)
        step = step_fns[name]
        state, netl, bin_aux = state0, net, None
        for s in range(WARMUP):
            state, netl, losses, aux = step(
                state, netl, batches[s % 4], bgs, lrs, sh_degree=3,
                gates=gates, bin_aux=bin_aux, next_cams=batches[(s + 1) % 4])
            bin_aux = aux.pop("next_bin_aux")
        _ = float(losses["total"])
        assert not bool(aux["overflow"])
        t0 = time.time()
        for s in range(TIMED):
            state, netl, losses, aux = step(
                state, netl, batches[s % 4], bgs, lrs, sh_degree=3,
                gates=gates, bin_aux=bin_aux, next_cams=batches[(s + 1) % 4])
            bin_aux = aux.pop("next_bin_aux")
        _ = float(losses["total"])
        dt = (time.time() - t0) / (TIMED * k)
        return 1.0 / dt

    rows = []
    for p in range(PASSES):
        for name, strip, chunk in VARIANTS:
            t_start = time.time()
            its = run_variant(name, strip, chunk)
            rows.append({"pass": p, "variant": name, "iters_per_s":
                         round(its, 3),
                         "wall_s": round(time.time() - t_start, 1)})
            print(json.dumps(rows[-1]), flush=True)

    # summary over the cached passes only (pass 0 may include compile skew
    # in warmup; timed windows exclude compiles either way)
    summary = {}
    for name, _, _ in VARIANTS:
        vals = [r["iters_per_s"] for r in rows if r["variant"] == name
                and r["pass"] > 0]
        summary[name] = {"mean": round(float(np.mean(vals)), 3),
                         "min": round(float(np.min(vals)), 3),
                         "max": round(float(np.max(vals)), 3)}
    out = {"date": "2026-08-20", "shape": "1M/1600x1200 tile32 dtu_full",
           "peak_entries": peak_entries, "entry_budget": entry_budget,
           "steps_per_call": k, "rows": rows, "summary": summary}
    with open(os.path.join(REPO, "artifacts_r05", "ab_strip_chunk.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
