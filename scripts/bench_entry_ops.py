#!/usr/bin/env python
"""A/B microbenchmarks for the entry-pipeline primitives at PROTOCOL scale
(E ~ 9.8M entries, N = 2^20 gaussians, C = 16 feature rows).

The round-2 kernel-floor ledger (CLAUDE.md) was calibrated at dev scale
(E ~ 450k, N = 131k) where the lane gather beat row-gather+relayout and the
grouping-sort segsum beat scatter-add. The dtu_full profile shows every
entry-wide stage degrading SUPER-linearly at 9.8M (fwd gather 158 ms vs a
~35 ms linear extrapolation), so the trade-offs need re-measuring at this
shape before redesigning the pipeline.

All variants run interleaved in one session (scan-based device timing, the
tunnel drifts +-20% across hours so only same-window comparisons count).

  env PYTHONPATH="/root/repo:/root/.axon_site" python -u scripts/bench_entry_ops.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=9_830_400)
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vcr_gaus_tpu.ops import binning as B

    E, N, C, kk, iters = args.e, args.n, args.c, args.k, args.iters
    EPS = 1e-20

    def dep(c, *outs):
        s = sum(jnp.sum(o).astype(jnp.float32) for o in outs)
        return jax.tree.map(
            lambda x: x + (EPS * s).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, c)

    results = {}

    def scan_time(label, body, carry0, xs=None):
        if args.only and not any(s in label for s in args.only.split(",")):
            return
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
        results[label] = ms
        print(f"{label:44s} {ms:8.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    # tile-sorted entry stream: gids quasi-random within tile runs
    gid = jnp.asarray(rng.integers(0, N, E, dtype=np.int64).astype(np.int32))
    # gid-grouped permutation (what the perm sort produces)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))
    tbl_t = jnp.asarray(rng.normal(size=(C, N + 1)).astype(np.float32))
    tbl_r = jnp.asarray(np.ascontiguousarray(
        rng.normal(size=(N + 1, C)).astype(np.float32)))
    g_ent = jnp.asarray(rng.normal(size=(C, E)).astype(np.float32))
    g_ent_r = jnp.asarray(rng.normal(size=(E, C)).astype(np.float32))
    offs = jnp.asarray(np.sort(rng.integers(0, E, N)).astype(np.int32))
    cnts = jnp.concatenate([jnp.diff(offs), jnp.asarray([0], jnp.int32)])
    depth_key = jnp.asarray(rng.integers(0, 1 << 30, E, dtype=np.int64)
                            .astype(np.int32))
    iota = jnp.arange(E, dtype=jnp.int32)

    print(f"E={E} N={N} C={C} scan k={kk} x {iters}", flush=True)

    # ---- forward gather variants -------------------------------------------
    def lane_gather(tbl, g):
        return dep(tbl, tbl[:, g])
    scan_time("fwd: lane gather (C,E) [current]", lane_gather, tbl_t,
              jnp.stack([gid] * kk))

    def row_gather(tbl, g):
        return dep(tbl, tbl[g, :])
    scan_time("fwd: row gather (E,C)", row_gather, tbl_r,
              jnp.stack([gid] * kk))

    def row_gather_t(tbl, g):
        return dep(tbl, tbl[g, :].T)
    scan_time("fwd: row gather + transpose -> (C,E)", row_gather_t, tbl_r,
              jnp.stack([gid] * kk))

    tbl_bf = tbl_t.astype(jnp.bfloat16)
    def lane_gather_bf(tbl, g):
        return dep(tbl, tbl[:, g].astype(jnp.float32)[:, :128])
    scan_time("fwd: lane gather bf16 table", lane_gather_bf, tbl_bf,
              jnp.stack([gid] * kk))

    # ---- backward segment-sum variants -------------------------------------
    def bwd_current(carry, x):
        g, p = x
        csum = B.cumsum_lanes(carry[:, p])
        csum = jnp.concatenate([jnp.zeros((C, 1), csum.dtype), csum], 1)
        lo = jnp.minimum(offs, E)
        hi = jnp.minimum(offs + cnts, E)
        return dep(carry, csum[:, hi] - csum[:, lo])
    scan_time("bwd: perm gather+cumsum+diff [current]", bwd_current, g_ent,
              (jnp.stack([g_ent] * kk), jnp.stack([perm] * kk)))

    def bwd_scatter_rows(carry, x):
        g, gidx = x
        out = jnp.zeros((N + 1, C), jnp.float32).at[gidx].add(
            g, mode="drop")
        return dep(carry, out)
    scan_time("bwd: scatter-add rows (E,C)->(N,C)", bwd_scatter_rows,
              g_ent_r, (jnp.stack([g_ent_r] * kk), jnp.stack([gid] * kk)))

    def bwd_scatter_lanes(carry, x):
        g, gidx = x
        out = jnp.zeros((C, N + 1), jnp.float32).at[:, gidx].add(
            g, mode="drop")
        return dep(carry, out)
    scan_time("bwd: scatter-add lanes (C,E)->(C,N)", bwd_scatter_lanes,
              g_ent, (jnp.stack([g_ent] * kk), jnp.stack([gid] * kk)))

    # ---- sort variants ------------------------------------------------------
    def sort2(carry, k):
        s, p = jax.lax.sort((k, iota), num_keys=1)
        return dep(carry, p.astype(jnp.float32)[:128])
    scan_time("sort: key+payload (1 sort)", sort2,
              jnp.zeros((8,), jnp.float32), jnp.stack([depth_key] * kk))

    def sort3(carry, k):
        s, p, q = jax.lax.sort((k, iota, iota), num_keys=1)
        return dep(carry, p.astype(jnp.float32)[:128],
                   q.astype(jnp.float32)[:128])
    scan_time("sort: key+2 payloads", sort3,
              jnp.zeros((8,), jnp.float32), jnp.stack([depth_key] * kk))

    # boundary gathers alone (the (C, cap) pair in the current bwd)
    def boundary(carry, _):
        csum = carry
        lo = jnp.minimum(offs, E)
        hi = jnp.minimum(offs + cnts, E)
        return dep(carry, csum[:, hi] - csum[:, lo])
    scan_time("bwd: boundary gathers only (2x (C,N))", boundary, g_ent)

    # cumsum alone
    def cumsum_only(carry, _):
        return dep(carry, B.cumsum_lanes(carry)[:, :128])
    scan_time("bwd: cumsum_lanes (C,E) only", cumsum_only, g_ent)

    # ---- index-locality study ------------------------------------------------
    # Hypothesis: gather cost is page/line-locality bound (6.5 ns/idx at
    # <=64 MB tables vs 21-28 ns/idx at 630 MB). If tile-sorted gaussian
    # storage makes perm/fwd indices WINDOWED (each output block reads a
    # small sliding window of the table), the big gathers should drop to
    # the small-table rate.
    ramp_e = np.linspace(0, E - 1, E)
    ramp_n = np.linspace(0, N - 1, E)
    for w in (1 << 17, 1 << 20, 1 << 23):
        idx = np.clip(ramp_e + rng.integers(-w // 2, w // 2, E), 0,
                      E - 1).astype(np.int32)
        idx_j = jnp.asarray(idx)
        def perm_gather_w(carry, x):
            return dep(carry, carry[:, x])
        scan_time(f"bwd: perm gather windowed W={w >> 10}k",
                  perm_gather_w, g_ent, jnp.stack([idx_j] * kk))
    for w in (1 << 14, 1 << 17):
        idx = np.clip(ramp_n + rng.integers(-w // 2, w // 2, E), 0,
                      N - 1).astype(np.int32)
        idx_j = jnp.asarray(idx)
        def fwd_gather_w(carry, x):
            return dep(carry, carry[:, x])
        scan_time(f"fwd: lane gather windowed W={w >> 10}k",
                  fwd_gather_w, tbl_t, jnp.stack([idx_j] * kk))
    # monotonic boundary-style gather: N sorted positions into the big table
    def boundary_one(carry, _):
        lo = jnp.minimum(offs, E)
        return dep(carry, carry[:, lo])
    scan_time("bwd: ONE boundary gather (C,N) sorted idx", boundary_one,
              g_ent)

    # fine window sweep on the E-lane table + issue-rate floor control
    for w in (1 << 10, 1 << 12, 1 << 14):
        idx = np.clip(ramp_e + rng.integers(-w // 2, w // 2, E), 0,
                      E - 1).astype(np.int32)
        idx_j = jnp.asarray(idx)
        def perm_gather_w2(carry, x):
            return dep(carry, carry[:, x])
        scan_time(f"bwd: perm gather windowed W={w >> 10}k",
                  perm_gather_w2, g_ent, jnp.stack([idx_j] * kk))
    tiny = jnp.asarray(rng.normal(size=(C, 1 << 14)).astype(np.float32))
    idx_tiny = jnp.asarray(rng.integers(0, 1 << 14, E, dtype=np.int64)
                           .astype(np.int32))
    def tiny_gather(carry, x):
        return dep(carry, carry[:, x])
    scan_time("floor: E idx from (C,16k) table", tiny_gather, tiny,
              jnp.stack([idx_tiny] * kk))

    # grouping-sort-with-gradient-payloads: ONE stable sort keyed by the
    # (budget-width) sorted_gid carrying all C gradient rows replaces the
    # perm sort (lookahead) + perm gather (bwd) pair IF per-payload sort
    # cost stays ~5.5 ms (1-op 25.6 / 3-op 36.5 above)
    for npay in (4, 8, 16):
        rows = tuple(g_ent[i] for i in range(npay))
        def sort_pay(carry, k, _rows=rows, _n=npay):
            out = jax.lax.sort((k,) + _rows, num_keys=1, is_stable=True)
            return dep(carry, *[o[:128] for o in out[1:]])
        scan_time(f"bwd: grouping sort + {npay} f32 payloads", sort_pay,
                  jnp.zeros((8,), jnp.float32), jnp.stack([gid] * kk))

    # slab-decomposed gather: per-index cost tracks the table's STATIC lane
    # count (2.7 ns @16k lanes -> 6.5 @1M -> 22 @9.8M, window locality
    # irrelevant), so fold the lane dim into sublanes: (C, L) -> (k*C, L/k),
    # gather retrieves all k slabs per lane, a masked sum selects the right
    # one. Extra traffic: the (k, C, E) intermediate.
    def slab_gather(table, idx, k):
        C, L = table.shape
        Lk = L // k
        t = table[:, :Lk * k].reshape(C, k, Lk).swapaxes(0, 1).reshape(
            k * C, Lk)
        lane = jnp.clip(idx % Lk, 0, Lk - 1)
        slab = idx // Lk
        g = t[:, lane].reshape(k, C, idx.shape[0])
        sel = (slab[None, :] == jnp.arange(k, dtype=idx.dtype)[:, None])
        return jnp.sum(g * sel[:, None, :].astype(g.dtype), axis=0)

    # k=16's (E, k*C) intermediate is ~9.4 GB at protocol E and OOMs the
    # chip (measured 2026-08-19); k=8 already ties k=4, so stop there.
    for k_slab in (4, 8):
        def perm_slab(carry, x, _k=k_slab):
            return dep(carry, slab_gather(carry, x, _k))
        scan_time(f"bwd: perm SLAB-gather k={k_slab} (C,E)",
                  perm_slab, g_ent, jnp.stack([perm] * kk))

    for k_slab in (4, 8):
        def fwd_slab(carry, x, _k=k_slab):
            return dep(carry, slab_gather(carry, x, _k))
        scan_time(f"fwd: lane SLAB-gather k={k_slab} (C,N)",
                  fwd_slab, tbl_t, jnp.stack([gid] * kk))

    def boundary_slab(carry, _):
        lo = jnp.minimum(offs, E)
        return dep(carry, slab_gather(carry, lo, 8))
    scan_time("bwd: ONE boundary SLAB-gather k=8", boundary_slab, g_ent)

    # f(L) curve fill-in
    for lanes in (1 << 19, 21 << 17, 42 << 17):
        t = jnp.asarray(rng.normal(size=(C, lanes)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, lanes, E, dtype=np.int64)
                          .astype(np.int32))
        def g_l(carry, x):
            return dep(carry, carry[:, x])
        scan_time(f"floor: E idx from (C,{lanes >> 10}k)", g_l, t,
                  jnp.stack([idx] * kk))

    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
