"""Differentiable rasterization facade: projection -> binning -> Pallas tiles.

Joins the pure-JAX projection stage (ops/projection.py), the XLA-sort tile
binning (ops/binning.py) and the Pallas compositing kernels
(ops/rasterize_tpu.py) into one differentiable `rasterize_image` call.

Gradient routing (the TPU-native re-design of the CUDA fork's custom
autograd, reference gaussian_renderer/__init__.py:107-120):

  * the Pallas pair is wrapped in `jax.custom_vjp` over the *per-entry*
    packed feature matrix; the backward kernel emits per-entry gradients;
  * the (N -> entries) gather sits *outside* the custom_vjp, so JAX autodiff
    of the gather performs the segment-sum back to per-Gaussian gradients and
    projection/activation VJPs come for free;
  * densification statistics (the reference's separate `means2D_densify`
    gradient stream, trainer.py:346-347) ride on a zero-valued dummy input
    whose "gradient" is the per-entry |d mean2d| accumulation.

Memory layout note: the binning emits a G-aligned layout (each tile's entry
region starts at a multiple of G and is rounded up to G), so every chunked
DMA slice is lane-aligned for Mosaic and tiles own exclusive regions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import binning as B
from . import projection as PF
from . import rasterize_tpu as K

TILE = K.TILE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _make_core(ch_sem: int, depth_mode: str, n_tx: int, n_ty: int):
    """custom_vjp-wrapped Pallas forward/backward for fixed static config."""

    nfeat = PF.feature_dim(ch_sem)

    @jax.custom_vjp
    def core(feats_t, dummy_t, tile_starts, tile_counts, cam):
        del dummy_t
        return K.rasterize_forward(feats_t, tile_starts, tile_counts, cam,
                                   n_tx, n_ty, ch_sem, depth_mode)

    def core_fwd(feats_t, dummy_t, tile_starts, tile_counts, cam):
        out = core(feats_t, dummy_t, tile_starts, tile_counts, cam)
        return out, (feats_t, tile_starts, tile_counts, cam)

    def core_bwd(res, g_out):
        feats_t, tile_starts, tile_counts, cam = res
        gfeat = K.rasterize_backward(feats_t, tile_starts, tile_counts, cam,
                                     g_out, n_tx, n_ty, ch_sem, depth_mode)
        g_feats_t = gfeat[: feats_t.shape[0]]
        # zero the padded feature rows beyond nfeat (they alias grad scratch)
        if feats_t.shape[0] > nfeat:
            g_feats_t = g_feats_t.at[nfeat:].set(0.0)
        g_dummy = gfeat[nfeat + K.GROW_ABS_X: nfeat + K.GROW_ABS_Y + 1]
        return (g_feats_t, g_dummy, None, None, None)

    core.defvjp(core_fwd, core_bwd)
    return core


def rasterize_image(
    feats: jnp.ndarray,        # (N, F) packed per-Gaussian features
    dummy2d: jnp.ndarray,      # (N, 2) zeros; its grad = |d mean2d| stats
    binning: B.Binning,
    cam: jnp.ndarray,          # (8,) [fx, fy, cx, cy, bg_r, bg_g, bg_b, 0]
    width: int,
    height: int,
    ch_sem: int,
    depth_mode: str,
) -> jnp.ndarray:
    """Composite the binned entries. Returns (C_out, H, W) with C_out = 9+S:
    rgb(3,bg-blended), normal(3), sum w*d, sum w*d^2, alpha, sem(S)."""
    n, F = feats.shape
    assert F == PF.feature_dim(ch_sem)
    n_tx, n_ty = B.tile_grid(width, height, TILE)
    e = binning.sorted_gid.shape[0]            # aligned size (multiple of G)
    e_pad = e
    f_pad = K.feat_rows(ch_sem)

    # gather entries; index n hits the zero pad row (invalid entries)
    feats_z = jnp.concatenate([feats, jnp.zeros((1, F), feats.dtype)], axis=0)
    entries = feats_z[binning.sorted_gid]                  # (E, F)
    dummy_z = jnp.concatenate([dummy2d, jnp.zeros((1, 2), dummy2d.dtype)], 0)
    dummy_e = dummy_z[binning.sorted_gid]                  # (E, 2)

    feats_t = jnp.zeros((f_pad, e_pad), jnp.float32)
    feats_t = feats_t.at[:F, :e].set(entries.T)
    dummy_t = jnp.zeros((2, e_pad), jnp.float32)
    dummy_t = dummy_t.at[:, :e].set(dummy_e.T)

    core = _make_core(ch_sem, depth_mode, n_tx, n_ty)
    out_tiles = core(feats_t, dummy_t, binning.tile_starts,
                     binning.tile_counts, cam)

    c_out = K.out_channels(ch_sem)
    img = out_tiles[:, :, :c_out].reshape(n_ty, n_tx, TILE, TILE, c_out)
    img = img.transpose(4, 0, 2, 1, 3).reshape(c_out, n_ty * TILE, n_tx * TILE)
    return img[:, :height, :width]


def rasterize_entry_stats(feats, binning, cam, width, height, ch_sem):
    """Per-Gaussian (pixel hit count, summed blending weight) — the
    f_count render modes of the reference fork (count_render/visi_acc_render,
    gaussian_renderer/__init__.py:250-571) collapsed into one stats kernel.
    Returns (count (N,), importance (N,))."""
    n, F = feats.shape
    n_tx, n_ty = B.tile_grid(width, height, TILE)
    e = binning.sorted_gid.shape[0]            # aligned size (multiple of G)
    e_pad = e
    f_pad = K.feat_rows(ch_sem)

    feats_z = jnp.concatenate([feats, jnp.zeros((1, F), feats.dtype)], axis=0)
    entries = feats_z[binning.sorted_gid]
    feats_t = jnp.zeros((f_pad, e_pad), jnp.float32)
    feats_t = feats_t.at[:F, :e].set(entries.T)

    stats = K.rasterize_stats(feats_t, binning.tile_starts,
                              binning.tile_counts, cam, n_tx, n_ty,
                              width, height)
    gid = binning.sorted_gid                                # (E,), n = invalid
    count = jnp.zeros((n + 1,), jnp.float32).at[gid].add(stats[0, :e])
    imp = jnp.zeros((n + 1,), jnp.float32).at[gid].add(stats[1, :e])
    return count[:n], imp[:n]
