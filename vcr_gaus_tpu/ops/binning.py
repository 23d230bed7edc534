"""Tile binning: (Gaussian, tile) key expansion + depth ordering + feature
materialization.

TPU-first re-design of the CUDA duplicate-keys + radix-sort stage
(rasterizer_impl.cu in the upstream 3DGS the reference forks), built from
the primitives that are actually fast on TPU (measured, with forced device
sync): row gathers (~6ms @ 2.3M x 16), lexicographic sort (~6ms @ 2M),
scatter+prefix-op forward fills (~10ms). `searchsorted` (scalarized,
~180ms) and large row *scatters* (~210ms) are avoided entirely — every
data movement on the hot path is a gather or a monotonic forward fill.

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


def _fill_monotonic(values, starts, size):
    """Forward fill: out[j] = values[t] for j in [starts[t], starts[t+1]),
    where values is nondecreasing in t. starts entries of empty segments must
    be excluded by the caller (set >= size). scatter-max + prefix-max."""
    marks = jnp.zeros((size,), values.dtype).at[starts].max(values,
                                                            mode="drop")
    return jax.lax.cummax(marks)


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

    The payload pass-through is the composite map
    entries_al[j] = payload[sorted_gid[j]] — callers wanting cheap gradients
    wrap it in a custom_vjp whose backward is a single scatter-add by
    sorted_gid (see ops/rasterize.py)."""
    n = mean2d.shape[0]
    n_tx, n_ty = tile_grid(width, height, tile)
    num_tiles = n_tx * n_ty

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

    # ---- expansion: gaussian-id forward fill + ONE aux row gather ----
    first_slot = jnp.where(count > 0, jnp.minimum(offsets, entry_budget - 1),
                           entry_budget)
    gid = _fill_monotonic(jnp.arange(n, dtype=jnp.int32), first_slot,
                          entry_budget)                    # (E,) ascending

    f32 = jnp.float32
    aux = jnp.stack([offsets.astype(f32), count.astype(f32),
                     x0.astype(f32), y0.astype(f32),
                     jnp.maximum(span_w, 1).astype(f32),
                     depth_sg.astype(f32)], axis=1)        # (N, 6)
    rows = aux[gid]                                        # (E, 6) row gather
    off_e = rows[:, 0].astype(jnp.int32)
    cnt_e = rows[:, 1].astype(jnp.int32)
    x0_e = rows[:, 2].astype(jnp.int32)
    y0_e = rows[:, 3].astype(jnp.int32)
    sw_e = rows[:, 4].astype(jnp.int32)
    depth_e = rows[:, 5]

    e_idx = jnp.arange(entry_budget, dtype=jnp.int32)
    slot = e_idx - off_e
    valid = (e_idx < total) & (slot >= 0) & (slot < cnt_e)
    sy = slot // sw_e
    sx = slot - sy * sw_e
    tile_id = (y0_e + sy) * n_tx + (x0_e + sx)
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depth_e, jnp.inf).astype(jnp.float32)

    # ---- sort carrying the gaussian id ----
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile_id, depth_key, gid), num_keys=2)
    sorted_gid = jnp.where(sorted_tile < num_tiles, sorted_gid, n)

    # ---- per-tile ranges + aligned layout (gather-based) ----
    tile_counts = jnp.zeros((num_tiles + 1,), jnp.int32).at[sorted_tile].add(
        1, mode="drop")[:num_tiles]
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                          jnp.cumsum(tile_counts)]).astype(jnp.int32)
    padded = cdiv_arr(tile_counts, align) * align
    a = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jnp.cumsum(padded)]).astype(jnp.int32)   # (T+1,)

    e_al = aligned_budget(entry_budget, num_tiles, align)
    astart = jnp.where(padded > 0, jnp.minimum(a[:-1], e_al - 1), e_al)
    # three monotonic fills give, per aligned slot: its tile's aligned start,
    # compact start, and compact end (measured faster than one tile fill +
    # a small row gather)
    a_fill = _fill_monotonic(a[:-1], astart, e_al)
    cs_fill = _fill_monotonic(cs[:-1], astart, e_al)
    ce_fill = _fill_monotonic(cs[1:], astart, e_al)

    j = jnp.arange(e_al, dtype=jnp.int32)
    src = cs_fill + (j - a_fill)
    val_al = (src >= 0) & (src < ce_fill)
    src = jnp.clip(src, 0, entry_budget - 1)
    gid_al = jnp.where(val_al, sorted_gid[src], n).astype(jnp.int32)

    binn = Binning(sorted_gid=gid_al, tile_starts=a[:-1],
                   tile_counts=tile_counts, num_entries=total,
                   overflow=overflow)
    entries_al = None
    if payload is not None:
        payload_z = jnp.concatenate(
            [payload, jnp.zeros((1, payload.shape[1]), payload.dtype)], 0)
        entries_al = payload_z[gid_al]                     # ONE row gather
    return binn, entries_al


def bin_gaussians(mean2d, radius, depth_z, width, height, tile,
                  entry_budget, align: int = 128) -> Binning:
    """Binning without feature materialization (stats paths, tests)."""
    binn, _ = bin_and_gather(mean2d, radius, depth_z, None, width, height,
                             tile, entry_budget, align)
    return binn
