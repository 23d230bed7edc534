#!/usr/bin/env python
"""Per-component cost breakdown of the forward rasterization kernel
(VERDICT r4 next #2c): a standalone Pallas kernel replicating
_fwd_kernel's exact loop structure (tile grid, per-chunk DMA double
buffer, (P,G) compute) with each compute component individually
removable. Timing-only — the ablated variants are numerically meaningless;
they exist to attribute the measured ~5.5 us/chunk.

Components (cumulative ablation from 'full'):
  full       alpha chain + triangular transmittance + dacc matmul + depth
             + accumulator write (the production fwd shape)
  no_depth   drop the intersection-depth block (rsqrt + div chain)
  no_tri     drop the 2x blockwise triangular HIGHEST matmuls
  no_dacc    drop the (P,G)x(G,c_acc) HIGHEST accumulation matmul
  no_exp     alpha's exp/log1p/exp chain replaced by 3 muls (keeps the
             same dataflow, isolates the transcendental cost)
  dma_only   DMA loop + accumulator write only

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/kernel_microprobe.py
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

TILE = 32
P = TILE * TILE
G = 256
F_PAD = 24
N_TILES = 1900            # protocol tile count (50 x 38)
CHUNKS = 6                # ~ protocol mean entries/tile (3.42M/1900/256)
C_ACC = 6
OUT_PAD = 16           # lane-dim multiple of 8 (Mosaic block alignment)
REPS = 5


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    E = N_TILES * CHUNKS * G
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.uniform(0.01, 0.9, (F_PAD, E)).astype(
        np.float32))
    starts = jnp.asarray((np.arange(N_TILES) * CHUNKS * G).astype(np.int32))
    counts = jnp.asarray(np.full(N_TILES, CHUNKS * G, np.int32))

    def kernel(starts_ref, counts_ref, feats_ref, out_ref, buf, acc_ref,
               sems, *, use_depth, use_tri, use_dacc, use_exp, use_alpha,
               depth=2, Gc=G, unroll=1):
        t = pl.program_id(0)
        start = pl.multiple_of(starts_ref[t], 128)
        n = counts_ref[t]
        nchunks = (n + Gc - 1) // Gc
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = (pix % TILE).astype(jnp.float32)
        py = (pix // TILE).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ut = (rows <= cols).astype(jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(start + k * Gc, Gc)], buf.at[slot],
                sems.at[slot])

        # prefetch depth: keep up to `depth` chunk DMAs outstanding
        for j in range(depth - 1):
            @pl.when(j < nchunks)
            def _(j=j):
                get_dma(j % depth, j).start()
        acc_ref[:] = jnp.zeros((P, 4 + C_ACC), jnp.float32)

        def body(k, _):
            slot = k % depth

            @pl.when(k + depth - 1 < nchunks)
            def _():
                get_dma((k + depth - 1) % depth, k + depth - 1).start()
            get_dma(slot, k).wait()
            f = buf[slot]
            mean_x, mean_y = f[0:1, :], f[1:2, :]
            A, B, C, op = f[2:3, :], f[3:4, :], f[4:5, :], f[5:6, :]
            if use_alpha:
                dx = px - mean_x
                dy = py - mean_y
                power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
                if use_exp:
                    alpha_raw = op * jnp.exp(power)
                else:
                    alpha_raw = op * (1.0 + power * 0.01)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, Gc), 1)
                live = (power <= 0.0) & (alpha_raw >= 1.0 / 255.0) & (
                    lane < n - k * Gc)
                alpha = jnp.where(live, jnp.minimum(alpha_raw, 0.99), 0.0)
            else:
                alpha = (px * 0.0 + op) * 0.001   # (P,Gc) via arithmetic
                # broadcast: an explicit broadcast_to from the (1,Gc) row
                # crashed Mosaic ("limits 128 vs dim 1")
            if use_exp and use_alpha:
                lg = jnp.log1p(-alpha)
            else:
                lg = -alpha
            if use_tri:
                parts = []
                carry = None
                for b in range(Gc // 128):
                    xb = lg[:, b * 128:(b + 1) * 128]
                    cb = jax.lax.dot_general(
                        xb, ut, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    if carry is not None:
                        cb = cb + carry
                    parts.append(cb)
                    carry = cb[:, 127:128]
                csum = jnp.concatenate(parts, axis=1)
            else:
                csum = lg
            if use_exp and use_alpha:
                trans_excl = jnp.exp(csum - lg)
            else:
                trans_excl = csum - lg + 1.0
            w = alpha * trans_excl
            if use_dacc:
                fsub = f[6:6 + C_ACC, :]
                dacc = jax.lax.dot_general(
                    w, fsub, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                dacc = jnp.zeros((P, C_ACC), jnp.float32)
            if use_depth:
                fx = 30.0
                dirx = (px + 0.5 - 16.0) / fx
                diry = (py + 0.5 - 16.0) / fx
                inv_n = jax.lax.rsqrt(dirx * dirx + diry * diry + 1.0)
                dz = f[6:7, :]
                denom_raw = (dirx * inv_n * f[7:8, :]
                             + diry * inv_n * f[8:9, :] + inv_n * f[9:10, :])
                clamped = jnp.abs(denom_raw) < 1e-2
                denom = jnp.where(clamped, 1e-2, denom_raw)
                d = dz / denom
            else:
                d = px * 0.0 + f[6:7, :]
            wd = w * d
            prev = acc_ref[:]
            acc_ref[:] = jnp.concatenate(
                [prev[:, 0:1] * 0.99,
                 prev[:, 1:2] + csum[:, Gc - 1:Gc],
                 prev[:, 2:3] + jnp.sum(wd, axis=1, keepdims=True),
                 prev[:, 3:4] + jnp.sum(wd * d, axis=1, keepdims=True),
                 prev[:, 4:] + dacc], axis=1)
            return 0

        if unroll == 1:
            jax.lax.fori_loop(0, nchunks, body, 0)
        else:
            # fori_loop(unroll=) needs static bounds; emulate by stepping
            # `unroll` guarded chunk bodies per dynamic loop iteration —
            # same work, 1/unroll the loop-machinery overhead
            def body_u(j, _):
                for i in range(unroll):
                    k = j * unroll + i

                    @pl.when(k < nchunks)
                    def _(k=k):
                        body(k, 0)
                return 0
            jax.lax.fori_loop(0, (nchunks + unroll - 1) // unroll,
                              body_u, 0)
        out_ref[0] = jnp.concatenate(
            [acc_ref[:], jnp.zeros((P, OUT_PAD - 4 - C_ACC), jnp.float32)],
            axis=1)

    def build(**toggles):
        depth = toggles.get("depth", 2)
        Gc = toggles.get("Gc", G)
        toggles.setdefault("unroll", 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, P, OUT_PAD), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((depth, F_PAD, Gc), jnp.float32),
                pltpu.VMEM((P, 4 + C_ACC), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )
        kfn = functools.partial(kernel, **toggles)
        call = pl.pallas_call(
            kfn, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N_TILES, P, OUT_PAD),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )

        @jax.jit
        def run(s, c, f):
            return jnp.sum(call(s, c, f))
        return run

    VARIANTS = {
        "full": dict(use_depth=True, use_tri=True, use_dacc=True,
                     use_exp=True, use_alpha=True),
        "no_depth": dict(use_depth=False, use_tri=True, use_dacc=True,
                         use_exp=True, use_alpha=True),
        "no_tri": dict(use_depth=True, use_tri=False, use_dacc=True,
                       use_exp=True, use_alpha=True),
        "no_dacc": dict(use_depth=True, use_tri=True, use_dacc=False,
                        use_exp=True, use_alpha=True),
        "no_exp": dict(use_depth=True, use_tri=True, use_dacc=True,
                       use_exp=False, use_alpha=True),
        "dma_only": dict(use_depth=False, use_tri=False, use_dacc=False,
                         use_exp=False, use_alpha=False),
        # prefetch depth: if the ~6.5us/chunk floor is DMA-latency bound,
        # deeper outstanding-copy windows should collapse it
        "full_d4": dict(use_depth=True, use_tri=True, use_dacc=True,
                        use_exp=True, use_alpha=True, depth=4),
        "full_d6": dict(use_depth=True, use_tri=True, use_dacc=True,
                        use_exp=True, use_alpha=True, depth=6),
        # chunk size: halves/doubles the chunk count at fixed E
        "full_g512": dict(use_depth=True, use_tri=True, use_dacc=True,
                          use_exp=True, use_alpha=True, Gc=512),
        "full_g128": dict(use_depth=True, use_tri=True, use_dacc=True,
                          use_exp=True, use_alpha=True, Gc=128),
        "full_d4_g512": dict(use_depth=True, use_tri=True, use_dacc=True,
                             use_exp=True, use_alpha=True, depth=4, Gc=512),
        # loop-machinery isolation: unroll the chunk fori_loop (the ~2us/
        # chunk fixed cost candidate vs acc-RMW vs DMA wait)
        "full_u3": dict(use_depth=True, use_tri=True, use_dacc=True,
                        use_exp=True, use_alpha=True, unroll=3),
        "full_u6": dict(use_depth=True, use_tri=True, use_dacc=True,
                        use_exp=True, use_alpha=True, unroll=6),
        "dma_u6": dict(use_depth=False, use_tri=False, use_dacc=False,
                       use_exp=False, use_alpha=False, unroll=6),
    }
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma list (crash bisection: one per process)")
    args = ap.parse_args()
    sel = [v for v in args.variants.split(",") if v]
    fns = {name: build(**VARIANTS[name]) for name in sel}
    res = {"shape": f"{N_TILES} tiles x {CHUNKS} chunks x G{G} P{P}",
           "n_chunks": N_TILES * CHUNKS, "date": "2026-08-20"}
    # compile all first, then interleave timing
    for name, fn in fns.items():
        _ = float(fn(starts, counts, feats))
    for rep in range(REPS):
        for name, fn in fns.items():
            t0 = time.time()
            _ = float(fn(starts, counts, feats))
            dt = time.time() - t0
            res.setdefault(name, []).append(round(dt * 1e3, 2))
    summary = {}
    for name in sel:
        best = min(res[name])
        gc = VARIANTS[name].get("Gc", G)
        nch = N_TILES * (CHUNKS * G // gc)
        summary[name] = {"ms": best, "n_chunks": nch,
                         "us_per_chunk": round(best * 1e3 / nch, 3)}
    res["summary"] = summary
    print(json.dumps(summary, indent=1))
    with open(os.path.join(REPO, "artifacts_r05", "kernel_microprobe.json"),
              "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
