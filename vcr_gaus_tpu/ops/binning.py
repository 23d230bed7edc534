"""Tile binning: (Gaussian, tile) key expansion + depth ordering + feature
materialization.

TPU-first re-design of the CUDA duplicate-keys + radix-sort stage
(rasterizer_impl.cu in the upstream 3DGS the reference forks), built from
the primitives that are actually fast on TPU (measured, with forced device
sync): row gathers (~6ms @ 2.3M x 16), single-key sort, matmuls, and
monotonic forward fills (~10ms @ 2M). `searchsorted` (scalarized, ~180ms)
and large scatters (~20-40ms @ 2M rows) are avoided entirely — every data
movement on the hot path is a gather, a matmul, or a monotonic forward
fill, plus ONE stable sort.

v4 pipeline (each step and what it replaced):
  1. per-Gaussian tile rects + entry counts/offsets      (elementwise)
  2. gaussian-id expansion over entry slots              (fill + row gather)
  3. per-tile entry histogram as an MXU matmul
     counts = Y^T @ X over rect row/col indicators       (replaces a ~1M-row
     scatter-add)
  4. alignment padding generated *analytically* per tile and sorted WITH the
     entries: each tile contributes (-count mod align) synthetic entries
     carrying max depth, so after the sort every tile's region lands at its
     aligned start with pad slots (gid == N) trailing its real entries
     (replaces three ~1.3M forward fills + a relayout gather)
  5. ONE stable single-key sort on a packed uint32
     (tile_id << depth_bits | quantized_depth) carrying gid (replaces a
     3-operand 2-key sort)

Depth inside a tile is ordered by the top `32 - ceil(log2(T+1))` bits of the
positive-float32 bit pattern (monotonic for d > 0; near-plane cull
guarantees d > 0.2). At 800x600 that keeps 11 mantissa bits — a relative
depth resolution of ~0.05%, far below any visible compositing difference;
ties resolve to expansion (gaussian-index) order, the same tiebreak as the
reference's stable radix sort.

Layout contract (consumed by ops/rasterize_tpu.py): each tile's entries
occupy an exclusive region starting at a multiple of ``align`` (= the raster
chunk size), so chunk DMAs are lane-aligned. Padding slots carry gid == N.

Everything is static shape; overflow beyond the entry budget drops the
highest-index gaussians' entries and is reported so the host can grow the
budget (with a recompile). An overflow step may mis-bin tiles (region
arithmetic assumes the untruncated population) but stays in-bounds and
finite; the trainer's response to the flag is grow-and-recompile either way.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    sorted_gid: jnp.ndarray    # (E_al,) int32 gaussian index per slot (N = pad)
    tile_starts: jnp.ndarray   # (T,) int32 aligned region start per tile
    tile_counts: jnp.ndarray   # (T,) int32 valid entries per tile
    num_entries: jnp.ndarray   # () int32 total valid entries (pre-truncation)
    overflow: jnp.ndarray      # () bool — entry budget exceeded
    gauss_offsets: jnp.ndarray # (N,) int32 exclusive entry-count cumsum
    gauss_counts: jnp.ndarray  # (N,) int32 entries per gaussian


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def tile_grid(width: int, height: int, tile: int) -> tuple[int, int]:
    return cdiv(width, tile), cdiv(height, tile)


def aligned_budget(entry_budget: int, num_tiles: int, align: int) -> int:
    """Static size of the aligned entry array. Four extra align blocks of
    sentinel slack let a raster kernel whose DMA chunk is LARGER than the
    region alignment (G up to 4*align = rasterize_tpu.set_chunk's cap)
    overrun the final tile's region without reading past the array; slack
    slots sort to the tail carrying gid == N (zero payload, alpha 0)."""
    return cdiv(entry_budget, align) * align + (num_tiles + 4) * align


def depth_key_bits(num_tiles: int) -> int:
    """Bits of the packed sort key holding the quantized depth."""
    return 32 - max(1, num_tiles.bit_length())


def cdiv_arr(x: jnp.ndarray, m: int) -> jnp.ndarray:
    return -(-x // m)


def slab_k(lanes: int, target: int = 1 << 18, cap: int = 4) -> int:
    """Slab factor for slab_lane_gather: largest power-of-two k <= cap that
    divides `lanes` and keeps lanes/k >= target. 1 below ~512k lanes, where
    the plain gather already runs at its floor rate."""
    k = 1
    while k < cap and lanes % (k * 2) == 0 and lanes // (k * 2) >= target:
        k *= 2
    return k


def slab_lane_gather(table: jnp.ndarray, idx: jnp.ndarray,
                     k: int | None = None,
                     chunk_bytes: int = 256 << 20) -> jnp.ndarray:
    """``table[:, idx]`` for a (C, L) table, decomposed to dodge XLA's
    table-size gather penalty.

    Measured on v5e (scripts/bench_entry_ops.py, E = 9.8M indices): the TPU
    lane gather costs ~2.7 ns/index from a 16k-lane table but ~22 ns/index
    from a 9.8M-lane one, and the cost tracks the table's STATIC lane count
    — index locality is irrelevant (a 4 KB-window index stream is exactly as
    slow as uniform random). Folding lanes into sublanes — (C, L) ->
    (k*C, L/k), ONE gather retrieving all k slab candidates per index, then
    a one-hot select — runs at the smaller table's rate: 220 -> 131 ms for
    the protocol-scale grouping gather. k is capped at 4: the (k*C, E)
    intermediate is the new cost (k=8 measures the same but doubles it).

    XLA materializes that (k*C, n_idx) gather output, so the index stream
    is processed in static chunks of <= chunk_bytes worth of intermediate
    (~1M indices at k=4, C=16): without the cap, the full training step at
    protocol scale carries two ~2.5 GB temporaries past their use and OOMs
    a 16 GB chip that fits comfortably pre-slab."""
    C, L = table.shape
    n_idx = idx.shape[0]
    if k is None:
        k = 1 if os.environ.get("VCR_NO_SLAB") else slab_k(L)
    if k == 1:
        return table[:, idx]
    lk = L // k
    t = table.reshape(C, k, lk).swapaxes(0, 1).reshape(k * C, lk)
    slab = idx // lk
    lane = idx - slab * lk
    arange_k = jnp.arange(k, dtype=idx.dtype)[:, None, None]

    def _one(lane_c, slab_c):
        n = lane_c.shape[0]
        g = t[:, lane_c].reshape(k, C, n)
        sel = slab_c[None, None, :] == arange_k
        return jnp.sum(jnp.where(sel, g, 0), axis=0)

    chunk = max(1, chunk_bytes // (k * C * table.dtype.itemsize))
    if n_idx <= chunk:
        return _one(lane, slab)
    # static unrolled chunks (last one ragged); each keeps its own
    # (k*C, chunk) intermediate small enough to overlap-and-free
    parts = [_one(lane[s:s + chunk], slab[s:s + chunk])
             for s in range(0, n_idx, chunk)]
    return jnp.concatenate(parts, axis=1)


def pad_lanes_for_slabs(table: jnp.ndarray, min_pad: int = 0) -> jnp.ndarray:
    """Zero-pad a (C, L) table's lane count so slab_k can divide it: at
    least ``min_pad`` extra lanes, total rounded up to a multiple of the
    slab cap (4). Padded lanes read as zeros; callers' indices never have
    to reach them unless they point at the first pad lane by contract."""
    L = table.shape[1]
    pad = max(min_pad, 0)
    total = -(-(L + pad) // 4) * 4
    if total == L:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((table.shape[0], total - L), table.dtype)], 1)


def cumsum_lanes(x):
    """Inclusive cumulative sum along the LAST axis as blockwise
    (..., rows, 128) x (128, 128) upper-triangular MXU matmuls plus a
    recursive cross-row carry. XLA's native cumulative ops lower to slow
    pass chains on TPU (measured ~1.8 ms for a (16, 458k) f32 cumsum and
    ~1.0 ms for a 131k int cumsum; this runs both in ~0.1-0.2 ms).

    Integer inputs are summed in f32 on the MXU: exact while every prefix
    stays below 2^24. The binning prefixes are bounded by the total entry
    count, which only exceeds 2^24 in overflow regimes where the step is
    discarded and the budget regrown anyway (see bin_and_gather's overflow
    contract)."""
    orig_l = x.shape[-1]
    if orig_l <= 1024:
        return jnp.cumsum(x, axis=-1)
    orig_dtype = x.dtype
    xf = x if jnp.issubdtype(orig_dtype, jnp.floating) else x.astype(
        jnp.float32)
    lanes = 128
    rows = cdiv(orig_l, lanes)
    pad = rows * lanes - orig_l
    if pad:
        xf = jnp.pad(xf, [(0, 0)] * (xf.ndim - 1) + [(0, pad)])
    a = xf.reshape(*xf.shape[:-1], rows, lanes)
    ri = jnp.arange(lanes, dtype=jnp.int32)
    ut = (ri[:, None] <= ri[None, :]).astype(jnp.float32)   # (128,128)
    nd = a.ndim
    # HIGHEST precision: the default TPU matmul truncates INPUTS to bf16
    # (393 -> 392), which corrupts exact integer prefixes; the 0/1
    # triangular operand is bf16-exact either way
    c = jax.lax.dot_general(
        a, ut, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # in-row prefix
    tot = c[..., -1]                                        # (..., rows)
    c = c + (cumsum_lanes(tot) - tot)[..., None]            # row carry
    out = c.reshape(*c.shape[:-2], rows * lanes)
    if pad:
        out = out[..., :orig_l]
    if out.dtype != orig_dtype:
        out = jnp.round(out).astype(orig_dtype)
    return out


def _cummax_blocked(x):
    """Inclusive prefix max of a 1-D int array, two-level: reshape to
    (rows, 128) lanes, 7 shifted maxes within the lane dim, then a tiny
    cross-row carry. XLA's 1-D lax.cummax lowers to a slow pass chain on
    TPU (measured ~2.1 ms @ 458k); this runs at memory speed."""
    n = x.shape[0]
    lanes = 128
    rows = cdiv(n, lanes)
    ident = jnp.iinfo(x.dtype).min
    a = jnp.pad(x, (0, rows * lanes - n), constant_values=ident)
    a = a.reshape(rows, lanes)
    s = 1
    while s < lanes:
        a = jnp.maximum(a, jnp.pad(a[:, :-s], ((0, 0), (s, 0)),
                                   constant_values=ident))
        s *= 2
    carry = jax.lax.cummax(a[:, -1])                   # (rows,) — tiny
    carry = jnp.pad(carry[:-1], (1, 0), constant_values=ident)
    return jnp.maximum(a, carry[:, None]).reshape(-1)[:n]


def _fill_monotonic(values, starts, size):
    """Forward fill: out[j] = values[t] for j in [starts[t], starts[t+1]),
    where values is nondecreasing in t. starts entries of empty segments must
    be excluded by the caller (set >= size). scatter-max + prefix-max."""
    marks = jnp.zeros((size,), values.dtype).at[starts].max(values,
                                                            mode="drop")
    return _cummax_blocked(marks)


def bin_and_gather(
    mean2d: jnp.ndarray,     # (N,2) pixel means
    radius: jnp.ndarray,     # (N,) int32; 0 = culled
    depth_z: jnp.ndarray,    # (N,)
    payload: jnp.ndarray | None,  # (C, N) per-gaussian feature ROWS
    width: int,
    height: int,
    tile: int,
    entry_budget: int,
    align: int = 128,
    extents: jnp.ndarray | None = None,   # (N,2) per-axis pixel extents;
                                          # default = circular `radius`
):
    """Bin gaussians to tiles and (optionally) materialize per-entry feature
    columns in the aligned layout. Returns (Binning, entries_t (C, E_al) or
    None).

    The payload is TRANSPOSED — (C, N), gaussians along lanes — and the
    pass-through is the composite map entries_t[:, j] =
    payload[:, sorted_gid[j]], i.e. one lane gather. That produces the
    (C, E_al) layout the raster kernels consume DIRECTLY, eliminating the
    (E_al, C) -> (C, E_al) relayout a row gather would force (~0.8 ms at
    bench shapes). Callers wanting cheap gradients wrap it in a custom_vjp
    whose backward is a scatter-free sorted segment-sum (ops/rasterize.py)."""
    n = mean2d.shape[0]
    n_tx, n_ty = tile_grid(width, height, tile)
    num_tiles = n_tx * n_ty
    db = depth_key_bits(num_tiles)
    dmask = jnp.uint32((1 << db) - 1)

    mean2d = jax.lax.stop_gradient(mean2d)
    depth_sg = jax.lax.stop_gradient(depth_z)
    if extents is None:
        rx = ry = radius.astype(jnp.float32)
        alive = radius > 0
    else:
        extents = jax.lax.stop_gradient(extents)
        rx, ry = extents[:, 0], extents[:, 1]
        alive = (radius > 0) & (rx > 0) & (ry > 0)

    # CUDA getRect semantics: min inclusive, max exclusive.
    x0 = jnp.clip(((mean2d[:, 0] - rx) / tile).astype(jnp.int32), 0, n_tx)
    y0 = jnp.clip(((mean2d[:, 1] - ry) / tile).astype(jnp.int32), 0, n_ty)
    x1 = jnp.clip(((mean2d[:, 0] + rx + tile - 1) / tile).astype(jnp.int32), 0, n_tx)
    y1 = jnp.clip(((mean2d[:, 1] + ry + tile - 1) / tile).astype(jnp.int32), 0, n_ty)

    span_w = jnp.maximum(x1 - x0, 0)
    span_h = jnp.maximum(y1 - y0, 0)
    count = jnp.where(alive, span_w * span_h, 0).astype(jnp.int32)

    offsets = cumsum_lanes(count) - count                  # exclusive
    total = offsets[-1] + count[-1]
    overflow = total > entry_budget

    # ---- per-tile histogram on the MXU: counts2d[ty,tx] = #rects covering
    # (ty,tx) = sum_n Y[n,ty] * X[n,tx] ----
    ix = jnp.arange(n_tx, dtype=jnp.int32)[None, :]
    iy = jnp.arange(n_ty, dtype=jnp.int32)[None, :]
    X = ((ix >= x0[:, None]) & (ix < x1[:, None])
         & alive[:, None]).astype(jnp.float32)             # (N, n_tx)
    Y = ((iy >= y0[:, None]) & (iy < y1[:, None])).astype(jnp.float32)
    counts2d = jax.lax.dot_general(Y, X, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    tile_counts = jnp.round(counts2d).astype(jnp.int32).reshape(num_tiles)

    padded = cdiv_arr(tile_counts, align) * align
    a = (jnp.cumsum(padded) - padded).astype(jnp.int32)    # exclusive
    e_al = aligned_budget(entry_budget, num_tiles, align)
    fits = a + padded <= e_al                              # only fails on ovf
    tile_counts = jnp.where(fits, tile_counts, 0)
    tile_starts = jnp.where(fits, a, 0)
    overflow = overflow | jnp.any(~fits)

    # ---- expansion: gaussian-id forward fill + ONE aux row gather ----
    # gaussians whose entries start past the budget are dropped entirely
    # (marking them anywhere inside would clobber the last kept gaussian's
    # slots); kept entries are then EXACTLY expansion slots [0, min(total,
    # budget)) — the invariant the segment-sum backward relies on
    first_slot = jnp.where((count > 0) & (offsets < entry_budget), offsets,
                           entry_budget)
    gid = _fill_monotonic(jnp.arange(n, dtype=jnp.int32), first_slot,
                          entry_budget)                    # (E,) ascending

    f32 = jnp.float32
    aux_t = jnp.stack([offsets.astype(f32), count.astype(f32),
                       x0.astype(f32), y0.astype(f32),
                       jnp.maximum(span_w, 1).astype(f32),
                       depth_sg.astype(f32)], axis=0)      # (6, N)
    rows = slab_lane_gather(pad_lanes_for_slabs(aux_t), gid)   # (6, E)
    off_e = rows[0].astype(jnp.int32)
    cnt_e = rows[1].astype(jnp.int32)
    x0_e = rows[2].astype(jnp.int32)
    y0_e = rows[3].astype(jnp.int32)
    sw_e = rows[4].astype(jnp.int32)
    depth_e = rows[5]

    e_idx = jnp.arange(entry_budget, dtype=jnp.int32)
    slot = e_idx - off_e
    valid = (e_idx < total) & (slot >= 0) & (slot < cnt_e)
    sy = slot // sw_e
    sx = slot - sy * sw_e
    tile_id = ((y0_e + sy) * n_tx + (x0_e + sx)).astype(jnp.uint32)

    # quantized depth: top bits of the positive-float32 pattern (monotonic)
    dq = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(depth_e, jnp.uint32),
        jnp.uint32(32 - db))
    key = jnp.where(valid,
                    (tile_id << db) | dq,
                    (jnp.uint32(num_tiles) << db) | dmask)
    gid_e = jnp.where(valid, gid, n)

    # ---- analytic per-tile alignment padding, sorted with the entries ----
    pad_needed = (padded - tile_counts)[:, None]           # (T,1) in [0,align)
    i_al = jnp.arange(align, dtype=jnp.int32)[None, :]
    t_col = jnp.arange(num_tiles, dtype=jnp.uint32)[:, None]
    pad_key = jnp.where(i_al < pad_needed,
                        (t_col << db) | dmask,
                        (jnp.uint32(num_tiles) << db) | dmask)
    pad_key = pad_key.reshape(num_tiles * align)
    pad_gid = jnp.full((num_tiles * align,), n, jnp.int32)

    # pad the expansion block to its aligned size, then ONE stable sort: the
    # sorted array IS the aligned layout (real entries first per tile — pads
    # tie at max depth but follow in input order — then the next tile)
    e_pad = e_al - num_tiles * align - entry_budget
    if e_pad:
        key = jnp.concatenate(
            [key, jnp.full((e_pad,), (jnp.uint32(num_tiles) << db) | dmask,
                           jnp.uint32)])
        gid_e = jnp.concatenate([gid_e, jnp.full((e_pad,), n, jnp.int32)])
    key_all = jnp.concatenate([key, pad_key])
    gid_all = jnp.concatenate([gid_e, pad_gid])
    _, sorted_gid = jax.lax.sort((key_all, gid_all), num_keys=1,
                                 is_stable=True)

    binn = Binning(sorted_gid=sorted_gid, tile_starts=tile_starts,
                   tile_counts=tile_counts, num_entries=total,
                   overflow=overflow, gauss_offsets=offsets,
                   gauss_counts=count)
    entries_t = None
    if payload is not None:
        # pad lane n (the pad-gid column) and the slab-divisibility lanes
        # all read zero
        payload_z = pad_lanes_for_slabs(payload, min_pad=1)
        entries_t = slab_lane_gather(payload_z, sorted_gid)
    return binn, entries_t


def bin_gaussians(mean2d, radius, depth_z, width, height, tile,
                  entry_budget, align: int = 128,
                  extents=None) -> Binning:
    """Binning without feature materialization (stats paths, tests)."""
    binn, _ = bin_and_gather(mean2d, radius, depth_z, None, width, height,
                             tile, entry_budget, align, extents=extents)
    return binn
