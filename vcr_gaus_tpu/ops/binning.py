"""Tile binning: (Gaussian, tile) key expansion + depth ordering.

TPU-first re-design of the CUDA duplicate-keys + radix-sort stage
(rasterizer_impl.cu in the upstream 3DGS the reference forks): instead of a
device-side dynamic allocation, we expand into a *fixed entry budget* using
the cumsum/searchsorted trick (exact per-Gaussian tile coverage, no per-
Gaussian cap), then lexicographically sort (tile_id, depth) with XLA's sort.

The sorted entries are then scattered into an **aligned layout**: each tile's
region starts at a multiple of ``align`` (= the raster kernel's chunk size,
128). This costs <= align-1 padding slots per non-empty tile but makes every
chunk DMA slice offset provably 128-lane aligned for Mosaic, and gives each
tile an exclusive, exactly-partitioned output region (no cross-tile DMA
overrun in the backward writes).

Everything is static shape; overflow beyond the budget drops the
highest-index Gaussians' entries and is reported so the host can grow the
budget (with a recompile) next step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


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


def bin_gaussians(
    mean2d: jnp.ndarray,     # (N,2) pixel means
    radius: jnp.ndarray,     # (N,) int32; 0 = culled
    depth_z: jnp.ndarray,    # (N,)
    width: int,
    height: int,
    tile: int,
    entry_budget: int,
    align: int = 128,
) -> Binning:
    n = mean2d.shape[0]
    n_tx, n_ty = tile_grid(width, height, tile)
    num_tiles = n_tx * n_ty

    mean2d = jax.lax.stop_gradient(mean2d)
    depth_z = jax.lax.stop_gradient(depth_z)
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

    # expand counts to per-entry gaussian ids WITHOUT searchsorted (XLA's
    # searchsorted is scalarized on TPU, ~100ms at this size): scatter each
    # non-empty gaussian's index at its first entry slot, then forward-fill
    # with a prefix max. Non-empty gaussians have unique offsets; empty ones
    # are dropped (their index must not appear).
    e = jnp.arange(entry_budget, dtype=jnp.int32)
    first_slot = jnp.where(count > 0, offsets, entry_budget)   # drop empties
    marks = jnp.zeros((entry_budget,), jnp.int32).at[first_slot].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    gid = jax.lax.cummax(marks)
    slot = e - offsets[gid]
    valid = (e < total) & (slot >= 0) & (slot < count[gid])

    sw = jnp.maximum(span_w[gid], 1)
    sy = slot // sw
    sx = slot - sy * sw
    tile_id = (y0[gid] + sy) * n_tx + (x0[gid] + sx)
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depth_z[gid], jnp.inf).astype(jnp.float32)

    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_id, depth_key, gid), num_keys=2
    )
    sorted_gid = jnp.where(sorted_tile < num_tiles, sorted_gid, n).astype(jnp.int32)

    # per-tile counts via bincount (scatter-add), starts via cumsum
    tile_counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[sorted_tile].add(
        1, mode="drop")[:num_tiles]
    compact_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_counts)])

    # aligned layout: region t = [a[t], a[t] + round_up(count, align)),
    # regions exactly partition [0, a[T]).
    padded = cdiv_arr(tile_counts, align) * align
    a = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
                        ).astype(jnp.int32)                         # (T+1,)

    e_al = aligned_budget(entry_budget, num_tiles, align)
    j = jnp.arange(e_al, dtype=jnp.int32)
    # tile-of-slot via the same scatter-max + cummax forward fill
    start_slot = jnp.where(padded > 0, a[:-1], e_al)
    tmarks = jnp.zeros((e_al,), jnp.int32).at[start_slot].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    t_of_j = jax.lax.cummax(tmarks)
    off = j - a[t_of_j]
    val = (off >= 0) & (off < tile_counts[t_of_j])
    src = jnp.clip(compact_starts[t_of_j] + off, 0, entry_budget - 1)
    gid_al = jnp.where(val, sorted_gid[src], n).astype(jnp.int32)

    return Binning(sorted_gid=gid_al, tile_starts=a[:-1].astype(jnp.int32),
                   tile_counts=tile_counts.astype(jnp.int32),
                   num_entries=total, overflow=overflow)


def cdiv_arr(x: jnp.ndarray, m: int) -> jnp.ndarray:
    return -(-x // m)
