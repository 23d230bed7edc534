"""Tile binning: (Gaussian, tile) key expansion + depth ordering + feature
materialization — gather-free on the hot path.

TPU-first re-design of the CUDA duplicate-keys + radix-sort stage
(rasterizer_impl.cu in the upstream 3DGS the reference forks). XLA's gather
runs at ~200ns/element on TPU, so every per-entry lookup here is expressed
as one of:

  * scatter + prefix-op forward fill (monotonic values: compact ids),
  * ONE Pallas windowed one-hot gather in expansion order (ops/gather_tpu.py)
    for all per-gaussian values at once (aux geometry + feature payload),
  * scatters for the sort permutation and the aligned placement (TPU
    scatters are ~10x faster than gathers).

Layout contract (consumed by ops/rasterize_tpu.py): each tile's entries
occupy an exclusive region starting at a multiple of ``align`` (= the raster
chunk size), so chunk DMAs are lane-aligned. Padding slots carry gid == N.

Everything is static shape; overflow beyond the entry budget drops the
highest-index gaussians' entries and is reported so the host can grow the
budget (with a recompile).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import gather_tpu as GT


class Binning(NamedTuple):
    sorted_gid: jnp.ndarray    # (E_al,) int32 gaussian index per slot (N = pad)
    tile_starts: jnp.ndarray   # (T,) int32 aligned region start per tile
    tile_counts: jnp.ndarray   # (T,) int32 valid entries per tile
    num_entries: jnp.ndarray   # () int32 total valid entries (pre-truncation)
    overflow: jnp.ndarray      # () bool — entry budget exceeded


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def tile_grid(width: int, height: int, tile: int) -> tuple[int, int]:
    return cdiv(width, tile), cdiv(height, tile)


def aligned_budget(entry_budget: int, num_tiles: int, align: int) -> int:
    """Static size of the aligned entry array."""
    return cdiv(entry_budget, align) * align + num_tiles * align


def cdiv_arr(x: jnp.ndarray, m: int) -> jnp.ndarray:
    return -(-x // m)


N_AUX = 8  # aux columns: gid, offset, count, x0, y0, span_w, depth, (pad)


def bin_and_gather(
    mean2d: jnp.ndarray,     # (N,2) pixel means
    radius: jnp.ndarray,     # (N,) int32; 0 = culled
    depth_z: jnp.ndarray,    # (N,)
    payload: jnp.ndarray | None,  # (N, C) per-gaussian feature columns
    width: int,
    height: int,
    tile: int,
    entry_budget: int,
    align: int = 128,
):
    """Bin gaussians to tiles and (optionally) materialize per-entry feature
    rows in the aligned layout. Returns (Binning, entries_al (E_al, C) or
    None).

    The payload pass-through is linear in ``payload`` with the composite map
    entries_al[j] = payload[sorted_gid[j]] — callers wanting cheap gradients
    should wrap it in a custom_vjp whose backward is a single scatter-add by
    sorted_gid (see ops/rasterize.py)."""
    n = mean2d.shape[0]
    n_tx, n_ty = tile_grid(width, height, tile)
    num_tiles = n_tx * n_ty
    assert entry_budget % GT.BLOCK == 0

    mean2d = jax.lax.stop_gradient(mean2d)
    depth_sg = jax.lax.stop_gradient(depth_z)
    r = radius.astype(jnp.float32)

    # CUDA getRect semantics: min inclusive, max exclusive.
    x0 = jnp.clip(((mean2d[:, 0] - r) / tile).astype(jnp.int32), 0, n_tx)
    y0 = jnp.clip(((mean2d[:, 1] - r) / tile).astype(jnp.int32), 0, n_ty)
    x1 = jnp.clip(((mean2d[:, 0] + r + tile - 1) / tile).astype(jnp.int32), 0, n_tx)
    y1 = jnp.clip(((mean2d[:, 1] + r + tile - 1) / tile).astype(jnp.int32), 0, n_ty)

    span_w = jnp.maximum(x1 - x0, 0)
    span_h = jnp.maximum(y1 - y0, 0)
    count = jnp.where(radius > 0, span_w * span_h, 0).astype(jnp.int32)

    offsets = jnp.cumsum(count) - count                    # exclusive
    total = offsets[-1] + count[-1]
    overflow = total > entry_budget

    # ---- expansion: compact-id forward fill (no searchsorted/gather) ----
    cid, _ = GT.compact_ids(count)
    first_slot = jnp.where(count > 0, jnp.minimum(offsets, entry_budget - 1),
                           entry_budget)
    marks = jnp.zeros((entry_budget,), jnp.int32).at[first_slot].max(
        jnp.maximum(cid, 0), mode="drop")
    cgid_e = jax.lax.cummax(marks)                         # (E,) ascending

    # ---- one windowed gather for ALL per-gaussian values ----
    f32 = jnp.float32
    aux = jnp.stack([
        jnp.arange(n, dtype=f32),                 # 0: raw gid (exact < 2^24)
        offsets.astype(f32),                      # 1
        count.astype(f32),                        # 2
        x0.astype(f32),                           # 3
        y0.astype(f32),                           # 4
        span_w.astype(f32),                       # 5
        depth_sg.astype(f32),                     # 6
        jnp.zeros((n,), f32),                     # 7 pad
    ], axis=1)
    ctab = jnp.concatenate([aux, payload], axis=1) if payload is not None \
        else aux
    ctab = GT.compact_table(ctab, cid)
    rows = GT.windowed_gather(ctab, cgid_e)                # (E, 8+C)

    gid_e = rows[:, 0].astype(jnp.int32)
    off_e = rows[:, 1].astype(jnp.int32)
    cnt_e = rows[:, 2].astype(jnp.int32)
    x0_e = rows[:, 3].astype(jnp.int32)
    y0_e = rows[:, 4].astype(jnp.int32)
    sw_e = jnp.maximum(rows[:, 5].astype(jnp.int32), 1)
    depth_e = rows[:, 6]
    feats_e = rows[:, N_AUX:] if payload is not None else None

    e_idx = jnp.arange(entry_budget, dtype=jnp.int32)
    slot = e_idx - off_e
    valid = (e_idx < total) & (slot >= 0) & (slot < cnt_e)
    sy = slot // sw_e
    sx = slot - sy * sw_e
    tile_id = (y0_e + sy) * n_tx + (x0_e + sx)
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depth_e, jnp.inf).astype(jnp.float32)

    # ---- sort carrying only the pre-sort position ----
    sorted_tile, _, sorted_pos = jax.lax.sort(
        (tile_id, depth_key, e_idx), num_keys=2)

    # ---- per-tile ranges + aligned layout ----
    tile_counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[sorted_tile].add(
        1, mode="drop")[:num_tiles]
    compact_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_counts)]).astype(jnp.int32)
    padded = cdiv_arr(tile_counts, align) * align
    a = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(padded)]).astype(jnp.int32)   # (T+1,)
    pad_before = a[:-1] - compact_starts[:-1]                     # (T,)

    # forward-fill pad_before over sorted positions (monotonic per tile)
    start_slot = jnp.where(tile_counts > 0,
                           jnp.minimum(compact_starts[:-1], entry_budget - 1),
                           entry_budget)
    pmarks = jnp.zeros((entry_budget,), jnp.int32).at[start_slot].max(
        pad_before, mode="drop")
    padfill = jax.lax.cummax(pmarks)                       # (E,) at sorted pos
    dest_of_sorted = e_idx + padfill                       # aligned dest per j

    e_al = aligned_budget(entry_budget, num_tiles, align)
    # dest per PRE-SORT entry via scatter (no gather)
    dest = jnp.zeros((entry_budget,), jnp.int32).at[sorted_pos].set(
        jnp.minimum(dest_of_sorted, e_al - 1))

    dest_safe = jnp.where(valid, dest, e_al)               # drop invalid
    gid_al = jnp.full((e_al,), n, jnp.int32).at[dest_safe].set(
        gid_e, mode="drop")

    binn = Binning(sorted_gid=gid_al, tile_starts=a[:-1],
                   tile_counts=tile_counts, num_entries=total,
                   overflow=overflow)
    entries_al = None
    if payload is not None:
        entries_al = jnp.zeros((e_al, payload.shape[1]), jnp.float32).at[
            dest_safe].set(feats_e, mode="drop")
    return binn, entries_al


def bin_gaussians(mean2d, radius, depth_z, width, height, tile,
                  entry_budget, align: int = 128) -> Binning:
    """Binning without feature materialization (stats paths, tests)."""
    binn, _ = bin_and_gather(mean2d, radius, depth_z, None, width, height,
                             tile, entry_budget, align)
    return binn
