"""Differentiable rasterization facade: binning+gather -> Pallas tiles.

Joins the pure-JAX projection stage (ops/projection.py), the gather-free
binning/feature materialization (ops/binning.py) and the
Pallas compositing kernels (ops/rasterize_tpu.py) into one differentiable
`rasterize_image` call.

Gradient routing (the TPU-native re-design of the CUDA fork's custom
autograd, reference gaussian_renderer/__init__.py:107-120) — two custom_vjp
boundaries keep every backward op cheap on TPU:

  * entry building (transposed payload -> aligned per-entry columns):
    forward is one lane gather by aligned gid, directly in the (C, E_al)
    layout the kernels consume; backward is a scatter-free sorted
    segment-sum over lane-blocked cumulative sums (autodiff of the gather
    would emit a slow TPU scatter; the explicit boundary also severs the
    non-differentiable binning plumbing);
  * the Pallas kernel pair: forward compositing / analytic backward
    emitting per-entry gradients, including two extra rows of |d mean2d|
    densification statistics that flow back as the gradient of the
    zero-valued dummy payload columns (the reference's separate
    `means2D_densify` gradient stream, trainer.py:346-347).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import binning as B
from . import projection as PF
from . import rasterize_tpu as K

def clear_tile_caches() -> None:
    """Drop every cached builder whose trace captured K.TILE — called by
    K.set_tile so a tile change cannot serve stale-tile programs (the
    caches are keyed on shapes only)."""
    _make_entry_builder_pre.cache_clear()
    _make_entry_builder.cache_clear()
    _make_core.cache_clear()


class BinAux(NamedTuple):
    """Precomputed binning + the gid-grouping permutation for the backward
    segment-sum. Producing this in the PREVIOUS training step's program
    ('binning lookahead') makes every sort->gather pair cross an XLA program
    boundary: a gather whose indices are computed by a sort in the SAME
    program runs ~4.5x slower on this TPU backend (measured 7.3ms vs 1.6ms
    @ 770k x 16) and no in-program barrier/laundering fixes it."""
    binn: B.Binning
    perm: jnp.ndarray          # (entry_budget,) int32 — aligned slots of the
                               # real entries, grouped by gaussian id


def compute_bin_aux(mean2d, radius, depth_z, width, height,
                    entry_budget, extents=None) -> BinAux:
    """Binning + backward permutation for one camera (geometry only, no
    payload — everything downstream of stop_gradient).

    The grouping sort runs over all E_al aligned slots, but only the first
    `entry_budget` outputs are kept: pad slots carry gid == N and therefore
    sort strictly after every real entry, and the backward segment-sum's
    segments all end at or before min(num_entries, entry_budget). Slicing
    here shrinks the backward's perm gather and cumsum by the pad block
    (~35% of E_al at bench shapes)."""
    binn = B.bin_gaussians(mean2d, radius, depth_z, width, height, K.TILE,
                           entry_budget, align=K.ALIGN, extents=extents)
    e_al = binn.sorted_gid.shape[0]
    iota = jnp.arange(e_al, dtype=jnp.int32)
    _, perm = jax.lax.sort((binn.sorted_gid, iota), num_keys=1)
    return BinAux(binn=binn, perm=perm[:entry_budget])


@functools.lru_cache(maxsize=None)
def _make_entry_builder_pre(entry_budget: int):
    """Entry builder over a precomputed BinAux: forward is one lane gather
    by the (input) sorted gid, producing the (C, E_al) layout the kernels
    consume; backward is the same segment-sum as _make_entry_builder but
    with the grouping permutation taken as an input instead of sorted
    in-program."""

    @jax.custom_vjp
    def build(payload_t, sorted_gid, perm, offs, cnts, total):
        return B.slab_lane_gather(B.pad_lanes_for_slabs(payload_t,
                                                        min_pad=1),
                                  sorted_gid)

    def build_fwd(payload_t, sorted_gid, perm, offs, cnts, total):
        return (build(payload_t, sorted_gid, perm, offs, cnts, total),
                (perm, offs, cnts, total))

    def build_bwd(res, g_entries_t):
        # perm is (entry_budget,): columns beyond the real entries are
        # pad-slot gradients that no segment can reach (boundaries <= kept)
        perm, offs, cnts, total = res
        return (_segment_sum_grouped(g_entries_t, perm, offs, cnts, total,
                                     entry_budget),
                None, None, None, None, None)

    build.defvjp(build_fwd, build_bwd)
    return build


def _segment_sum_grouped(g_entries_t, perm, offs, cnts, total,
                         entry_budget: int):
    """Per-gaussian sums of per-entry gradients: slab-gather the gradient
    columns into gid-grouped order, lane-blocked cumsum, then ONE
    slab-gathered boundary row differenced adjacently (offsets are an exact
    exclusive cumsum, so segment ends ARE the next segment's start —
    hi[g] == lo[g+1] — and a single (C, N+1) boundary fetch replaces the
    round-2 lo/hi pair).

    Grouped columns at positions >= kept are pad slots whose perm entries
    point into the kernel's UNWRITTEN output slack (the backward only
    writes tile regions; the slack block is uninitialized memory — NaN by
    design in interpret mode, whatever HBM held on chip). They are hard
    zeroed before the cumsum: the blockwise triangular matmul multiplies
    every lane pair, and NaN*0 == NaN, so one wild lane in the block
    containing position `kept` would poison the boundary most gaussians
    clamp to — the failure mode that froze the on-chip schedule rehearsal
    (all params NaN at iteration ~148)."""
    c = g_entries_t.shape[0]
    kept = jnp.minimum(total, entry_budget)
    grouped = B.slab_lane_gather(g_entries_t, perm)
    pos = jnp.arange(grouped.shape[1], dtype=jnp.int32)[None, :]
    grouped = jnp.where(pos < kept, grouped, 0.0)
    csum = B.cumsum_lanes(grouped)
    csum = jnp.concatenate([jnp.zeros((c, 1), csum.dtype), csum], 1)
    bounds = jnp.minimum(
        jnp.concatenate([offs, (offs[-1] + cnts[-1])[None]]), kept)
    s = B.slab_lane_gather(B.pad_lanes_for_slabs(csum), bounds)
    return s[:, 1:] - s[:, :-1]


@functools.lru_cache(maxsize=None)
def _make_entry_builder(width: int, height: int, entry_budget: int):
    """custom_vjp: (payload_t (C,N), geometry) -> (entries_t (C,E_al),
    Binning).

    Backward reduces per-entry gradients to per-Gaussian gradients WITHOUT a
    scatter: one gid sort groups the gradient columns so each gaussian's
    entries are contiguous (= the expansion order the binning itself used),
    then a lane-blocked cumsum + boundary-difference yields all segment sums
    with two small lane gathers. Segment boundaries are the binning's
    per-gaussian offsets, clamped to the kept-entry count, which stays exact
    even when the entry budget truncated the expansion."""

    def _run(payload_t, mean2d, radius, depth_z, extents):
        return B.bin_and_gather(mean2d, radius, depth_z, payload_t,
                                width, height, K.TILE, entry_budget,
                                align=K.ALIGN, extents=extents)

    @jax.custom_vjp
    def build(payload_t, mean2d, radius, depth_z, extents):
        binn, entries = _run(payload_t, mean2d, radius, depth_z, extents)
        return entries, binn

    def build_fwd(payload_t, mean2d, radius, depth_z, extents):
        binn, entries = _run(payload_t, mean2d, radius, depth_z, extents)
        return (entries, binn), (binn.sorted_gid, binn.gauss_offsets,
                                 binn.gauss_counts, binn.num_entries)

    def build_bwd(res, cot):
        g_entries_t, _ = cot                          # (C, E_al)
        gid_al, offs, cnts, total = res
        e_al = g_entries_t.shape[1]
        iota = jnp.arange(e_al, dtype=jnp.int32)
        _, perm = jax.lax.sort((gid_al, iota), num_keys=1)
        perm = perm[:entry_budget]    # pads (gid == N) sort after all real
        g_payload_t = _segment_sum_grouped(g_entries_t, perm, offs, cnts,
                                           total, entry_budget)
        return (g_payload_t, None, None, None, None)

    build.defvjp(build_fwd, build_bwd)
    return build


@functools.lru_cache(maxsize=None)
def _make_core(ch_sem: int, depth_mode: str, n_tx: int, n_ty: int):
    """custom_vjp-wrapped Pallas forward/backward for fixed static config.
    The gradient of feats_e includes the |d mean2d| densification cols at
    nfeat+0/1 (= the dummy payload columns)."""
    nfeat = PF.feature_dim(ch_sem)
    f_pad = K.feat_rows(ch_sem)

    @jax.custom_vjp
    def core(feats_t, tile_starts, tile_counts, cam):
        return K.rasterize_forward(feats_t, tile_starts, tile_counts, cam,
                                   n_tx, n_ty, ch_sem, depth_mode)

    def core_fwd(feats_t, tile_starts, tile_counts, cam):
        out = core(feats_t, tile_starts, tile_counts, cam)
        return out, (feats_t, tile_starts, tile_counts, cam, out)

    def core_bwd(res, g_out):
        feats_t, tile_starts, tile_counts, cam, out = res
        gfeat = K.rasterize_backward(feats_t, tile_starts, tile_counts, cam,
                                     g_out, out, n_tx, n_ty, ch_sem,
                                     depth_mode)
        # rows beyond the feature+stats block are scratch padding
        if f_pad > nfeat + K.N_EXTRA_GRAD:
            gfeat = gfeat.at[nfeat + K.N_EXTRA_GRAD:].set(0.0)
        return (gfeat, None, None, None)

    core.defvjp(core_fwd, core_bwd)
    return core


def rasterize_image(
    feats: jnp.ndarray,        # (N, F) packed per-Gaussian features
    dummy2d: jnp.ndarray,      # (N, 2) zeros; its grad = |d mean2d| stats
    mean2d: jnp.ndarray,       # (N, 2) screen means (binning geometry)
    radius: jnp.ndarray,       # (N,) int32; 0 = culled
    depth_z: jnp.ndarray,      # (N,)
    cam: jnp.ndarray,          # (8,) [fx, fy, cx, cy, bg_r, bg_g, bg_b, 0]
    width: int,
    height: int,
    ch_sem: int,
    depth_mode: str,
    entry_budget: int,
    bin_aux: BinAux | None = None,
    extents: jnp.ndarray | None = None,  # (N,2) tight per-axis extents
):
    """Bin + composite. Returns (img (C_out,H,W), Binning) with C_out = 9+S:
    rgb(3,bg-blended), normal(3), sum w*d, sum w*d^2, alpha, sem(S).

    With `bin_aux` (a BinAux computed for the SAME parameters and camera —
    typically by the previous step's program, see BinAux), the in-program
    binning is skipped and the gathers use input indices (fast path)."""
    n, F = feats.shape
    assert F == PF.feature_dim(ch_sem)
    n_tx, n_ty = B.tile_grid(width, height, K.TILE)
    f_pad = K.feat_rows(ch_sem)

    # the payload is built TRANSPOSED — (F_PAD, N), gaussians along lanes —
    # so the entry gather directly produces the (F_PAD, E_al) layout the
    # kernel consumes: the relayout happens once at N columns (cheap)
    # instead of transposing the E_al-wide gather output (~0.8 ms/direction
    # at bench shapes)
    pad_c = f_pad - (F + 2)
    rows = [feats.T, dummy2d.T]
    if pad_c:
        rows.append(jnp.zeros((pad_c, n), feats.dtype))
    payload_t = jnp.concatenate(rows, axis=0)              # (F_PAD, N)
    if bin_aux is not None:
        binn = bin_aux.binn
        build_pre = _make_entry_builder_pre(entry_budget)
        feats_t = build_pre(payload_t, binn.sorted_gid, bin_aux.perm,
                            binn.gauss_offsets, binn.gauss_counts,
                            binn.num_entries)
    else:
        build = _make_entry_builder(width, height, entry_budget)
        feats_t, binn = build(payload_t, mean2d, radius, depth_z, extents)

    core = _make_core(ch_sem, depth_mode, n_tx, n_ty)
    out_tiles = core(feats_t, binn.tile_starts, binn.tile_counts, cam)

    c_out = K.out_channels(ch_sem)
    img = out_tiles[:, :, :c_out].reshape(n_ty, n_tx, K.TILE, K.TILE, c_out)
    img = img.transpose(4, 0, 2, 1, 3).reshape(c_out, n_ty * K.TILE, n_tx * K.TILE)
    return img[:, :height, :width], binn


def rasterize_entry_stats(feats, mean2d, radius, depth_z, cam, width, height,
                          ch_sem, entry_budget, extents=None):
    """Per-Gaussian (pixel hit count, summed blending weight) — the
    f_count render modes of the reference fork (count_render/visi_acc_render,
    gaussian_renderer/__init__.py:250-571) collapsed into one stats kernel.
    Returns (count (N,), importance (N,))."""
    n, F = feats.shape
    n_tx, n_ty = B.tile_grid(width, height, K.TILE)
    f_pad = K.feat_rows(ch_sem)
    pad_c = f_pad - F
    ft = feats.T
    payload_t = (jnp.concatenate([ft, jnp.zeros((pad_c, n), feats.dtype)], 0)
                 if pad_c else ft)
    binn, entries_t = B.bin_and_gather(
        mean2d, radius, depth_z, payload_t, width, height, K.TILE,
        entry_budget, align=K.ALIGN, extents=extents)

    stats = K.rasterize_stats(entries_t, binn.tile_starts,
                              binn.tile_counts, cam, n_tx, n_ty, width,
                              height)
    gid = binn.sorted_gid                                # (E_al,), n = invalid
    count = jnp.zeros((n,), jnp.float32).at[gid].add(stats[0], mode="drop")
    imp = jnp.zeros((n,), jnp.float32).at[gid].add(stats[1], mode="drop")
    return count, imp
