#!/usr/bin/env python
"""Pin the v5e VPU peak by measurement (VERDICT r4 next #7): the roofline's
"~3.9 TF f32 VPU (estimate)" is the shakiest number in the §7.3 kernel-pair
verdict. Three microbenchmarks, each a lax.fori_loop chain on a VPU-shaped
f32 array, timed through the tunnel with an in-graph scalar reduction
(the only honest fence on this backend):

  fma    — x = x*a + b          (2 flop/elem/iter: the VPU's nominal unit)
  exp    — x = exp(x)*c         (transcendental rate, elem/s)
  select — x = where(x>t, x*a, x*b)  (compare+select+mul rate, elem/s)
  alpha  — the rasterizer's alpha-eval block at kernel shape (P,G):
           power = -(A dx^2 + C dy^2)/2 - B dx dy; alpha = op*exp(power);
           masked select — the §7.3 VPU-bound candidate, measured end to end

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/vpu_peak.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

SHAPE = (64, 64 * 1024)       # 4M f32 = 16 MB: VMEM-resident per block
K = 512                       # chain length (1-op-per-pass variant)
K2 = 32                       # memory passes for the unrolled variants
REPS = 5


def _chain(x, u, op):
    """K2 memory passes, each applying `u` fused elementwise ops."""
    import jax
    import jax.numpy as jnp

    def body(i, x):
        for _ in range(u):
            x = op(x)
        return x
    return jnp.sum(jax.lax.fori_loop(0, K2, body, x))


def timed(fn, *args):
    fn(*args).block_until_ready if False else None
    out = float(fn(*args))            # warmup + compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        out = float(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    n = SHAPE[0] * SHAPE[1]
    x0 = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 0.9, SHAPE).astype(np.float32))
    res = {"shape": list(SHAPE), "chain": K, "date": "2026-08-20"}

    # The first cut of this benchmark ran ONE op per loop iteration and
    # measured 650 GB/s for fma, exp and select alike — pure HBM bandwidth
    # (each fori_loop iteration is one memory pass; artifacts_r05/
    # chip_queue1.log). To expose the COMPUTE rate, fuse `u` ops per pass
    # and watch the time grow past the memory floor: rate = ops that fit
    # in the incremental time.
    for name, mk in (
        ("fma", lambda u: (lambda x: _chain(
            x, u, lambda y: y * np.float32(0.999) + np.float32(1e-4)))),
        ("exp", lambda u: (lambda x: _chain(
            x, u, lambda y: jnp.exp(-y) + np.float32(0.05)))),
        ("select", lambda u: (lambda x: _chain(
            x, u, lambda y: jnp.where(y > np.float32(0.5),
                                      y * np.float32(0.99),
                                      y * np.float32(1.01))))),
    ):
        rows = {}
        for u in (1, 8, 32, 128):
            fn = jax.jit(mk(u))
            dt, _ = timed(fn, x0)
            rows[u] = dt
        # incremental rate between the two largest unroll factors: the
        # memory pass is a common additive term, so the slope is compute
        d_ops = (128 - 32) * n * K2
        d_t = rows[128] - rows[32]
        res[f"{name}_gops_s"] = round(d_ops / max(d_t, 1e-9) / 1e9, 1)
        res[f"{name}_dt_ms"] = {u: round(v * 1e3, 2)
                                for u, v in rows.items()}
    res["fma_tflops"] = round(res["fma_gops_s"] * 2 / 1e3, 3)  # 2 flop/fma

    # bf16 fma rate: does the v5e VPU pack 2x bf16? (if yes, the kernel's
    # (P,G) alpha chain could run ~2x faster in bf16 with f32 log-sums)
    xb = x0.astype(jnp.bfloat16)
    rows = {}
    for u in (32, 128):
        fn = jax.jit(lambda x, u=u: _chain(
            x, u, lambda y: y * jnp.bfloat16(0.999) + jnp.bfloat16(1e-4)))
        dt, _ = timed(fn, xb)
        rows[u] = dt
    d_ops = (128 - 32) * n * K2
    res["fma_bf16_gops_s"] = round(
        d_ops / max(rows[128] - rows[32], 1e-9) / 1e9, 1)
    res["fma_bf16_dt_ms"] = {u: round(v * 1e3, 2) for u, v in rows.items()}

    # the kernel's alpha block at its true shape: P=1024 (tile 32), G=256
    P, G = 1024, 256
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.uniform(0, 32, (P, 1)).astype(np.float32))
    py = jnp.asarray(rng.uniform(0, 32, (P, 1)).astype(np.float32))
    mean_x = jnp.asarray(rng.uniform(0, 32, (1, G)).astype(np.float32))
    mean_y = jnp.asarray(rng.uniform(0, 32, (1, G)).astype(np.float32))
    A = jnp.asarray(rng.uniform(0.01, 0.2, (1, G)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-0.05, 0.05, (1, G)).astype(np.float32))
    C = jnp.asarray(rng.uniform(0.01, 0.2, (1, G)).astype(np.float32))
    op = jnp.asarray(rng.uniform(0.1, 1.0, (1, G)).astype(np.float32))

    @jax.jit
    def alpha_block(mx):
        def body(i, mx):
            dx = px - (mean_x + mx * np.float32(1e-6))
            dy = py - mean_y
            power = (np.float32(-0.5) * (A * dx * dx + C * dy * dy)
                     - B * dx * dy)
            a = op * jnp.exp(power)
            a = jnp.where(power > 0, np.float32(0.0), a)
            a = jnp.where(a < np.float32(1.0 / 255.0), np.float32(0.0),
                          jnp.minimum(a, np.float32(0.99)))
            return mx + jnp.sum(a) * np.float32(1e-12)
        return jax.lax.fori_loop(0, K, body, np.float32(0.0))

    dt, _ = timed(alpha_block, np.float32(0.0))
    res["alpha_block_dt_us_per_PG"] = round(dt * 1e6 / K, 2)
    res["alpha_block_gpair_s"] = round(P * G * K / dt / 1e9, 2)
    # flop accounting for the block: dx,dy (2) + power (6) + exp(1) +
    # mul (1) + 3 compares/selects (3) ~= 13 "ops"/pair
    res["alpha_block_gops_s"] = round(13 * P * G * K / dt / 1e9, 1)

    print(json.dumps(res))
    with open(os.path.join(REPO, "artifacts_r05", "vpu_peak.json"),
              "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
