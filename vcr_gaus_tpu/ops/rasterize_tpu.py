"""Pallas TPU tile rasterizer: forward + analytic backward compositing.

TPU-first re-design of the reference's CUDA rasterizer core
(diff-gaussian-rasterization fork, see SURVEY.md §2.3#1). Per 16x16 pixel
tile, the depth-sorted entry list (from ops/binning.py) is streamed from HBM
in double-buffered chunks of G=256 Gaussians; compositing is expressed as

  * alpha evaluation:              (P, G) VPU elementwise,
  * in-chunk exclusive cumprod:    log-space cumsum as blockwise
                                   (P,128)x(128,128) triangular matmuls on
                                   the MXU with a (P,1) carry,
  * feature accumulation:          a (P,G)x(G,C) matmul on the MXU,

with a (P,1) transmittance carry across chunks. The backward kernel walks
the list ONCE in reverse, reconstructing per-entry transmittance in log
space from the forward's saved log-T total, emitting per-entry gradients in
the same packed feature layout, which the host wrapper segment-sums back to
per-Gaussian gradients.

Early termination (CUDA-fork parity, upstream forward.cu): once every pixel
of a STRIP_ROWS-pixel consensus strip has transmittance < T_EPS, that
strip's remaining chunks' compute is skipped via pl.when (the DMA pipeline
runs on — at ~24 KB/chunk it is never the bottleneck). The CUDA fork's
consensus group is its 16x16 thread block (__syncthreads_count); ours is a
128-pixel row strip — FINER, so one uncovered pixel (background ray, splat
gap) only keeps its own strip compositing, not the whole tile. The forward
records per-strip composited-chunk counts in a hidden output channel; the
backward only processes those per strip and writes zero gradients for the
rest.

Deviations from the CUDA fork (documented, metric-neutral):
  * termination is at chunk granularity on the strip-max transmittance
    (conservative: never terminates earlier than the per-pixel CUDA rule);
  * distortion is the order-independent pairwise-squared form computed
    outside the kernel from the (sum w, sum w d, sum w d^2) channels.

Output channel layout per pixel (C_OUT = 9 + ch_sem):
  0:3 rgb (+ T_final * bg)  3:6 normal  6 depth  7 depth^2  8 alpha  9: sem
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import projection as PF

# Tile edge (pixels). 16 matches the CUDA fork's BLOCK_X/Y; 32 quarters the
# entry count E of large-splat scenes (every E-proportional stage — binning
# sorts, entry gather, backward segment-sum — shrinks with it) at the price
# of 4x pixel-work per surviving entry in this kernel. Import-time knob so
# A/B runs don't need a code edit; the trained output is identical either
# way (compositing order within a tile is depth order regardless of tile).
TILE = int(os.environ.get("VCR_TILE", "16"))
if TILE not in (8, 16, 32, 64):          # same set set_tile() accepts; a
    raise ValueError(                     # typo'd VCR_TILE would otherwise
        f"VCR_TILE={TILE} invalid; must be one of 8/16/32/64")
P = TILE * TILE          # pixels per tile
G = 256                  # entries per chunk
ALIGN = 128              # tile-region alignment (binning layout)
ALPHA_EPS = 1.0 / 255.0
ALPHA_CAP = 0.99
# chunk-level early termination: once EVERY pixel of a consensus group has
# transmittance below this, that group's remaining chunks are skipped
# (compute only; the DMA pipeline runs on). The CUDA fork terminates
# per-pixel at T < 1e-4 with a block-wide __syncthreads_count consensus
# over its 16x16 block (upstream forward.cu); group-max is the
# conservative TPU-vector analog.
T_EPS = 1e-4
# Termination-consensus granularity: pixels per strip. The kernels guard
# each STRIP_ROWS-pixel row-strip of the (P, G) chunk compute with its own
# transmittance consensus, so one uncovered pixel (background ray, splat
# gap) only keeps ITS strip compositing, not the whole tile. 128 = one
# (sublane-aligned) vector-register row block = 4 image rows at tile 32;
# finer than the CUDA fork's 256-pixel block consensus. 0 disables
# (tile-wide consensus) and is the DEFAULT: the r5 interleaved protocol
# A/B (artifacts_r05/ab_strip_chunk.json) measured strip 128 LOSING 5.7%
# end-to-end at 1M/1600x1200 (per-strip guard overhead + the extra
# accumulator traffic outweigh the 1.16x pair-work saving ab_term.py
# predicted, and on trained populations tiles fit 1-2 chunks so there is
# nothing to save), and dead-flat at the 800x600 dev shape. The machinery
# stays for dense-regime experiments via VCR_STRIP_ROWS / set_strip_rows.
STRIP_ROWS = int(os.environ.get("VCR_STRIP_ROWS", "0"))
if STRIP_ROWS and (STRIP_ROWS % 8 or STRIP_ROWS < 0):
    raise ValueError(f"VCR_STRIP_ROWS={STRIP_ROWS} must be a multiple of 8")


def _n_strips() -> int:
    """Consensus strips per tile at the current TILE/STRIP_ROWS globals.

    Gated to shapes where strips can pay: fewer than 4 strips (tile <= 16
    at the default 128) reverts to tile-wide consensus — measured
    (scripts/ab_term.py): dev-shape tiles hold ~1 chunk, so chunk-granular
    termination never fires and per-strip guards are pure overhead; the
    ns == 1 program is also byte-identical to the pre-strip kernel (compile
    cache hit). Capped at 8 strips (tile 64 would otherwise run 32 guard
    branches per chunk)."""
    if not STRIP_ROWS or P % STRIP_ROWS:
        return 1
    ns = P // STRIP_ROWS
    if ns < 4:
        return 1
    return min(ns, 8)


def set_strip_rows(rows: int) -> None:
    """A/B knob for the termination-consensus strip height (trace-time
    global; clears the rasterize caches). 0 = tile-wide consensus."""
    global STRIP_ROWS
    if rows and (rows % 8 or rows < 0):
        raise ValueError(f"strip_rows must be a multiple of 8, got {rows}")
    if rows == STRIP_ROWS:
        return
    STRIP_ROWS = rows
    from . import rasterize as _R
    _R.clear_tile_caches()
# Mosaic's default scoped-vmem guardrail is 16 MB; the (P, G) working set
# scales with the tile area, and at TILE=32 the backward's temporaries need
# ~22 MB (measured compile failure) of the chip's 128 MB VMEM. Leave the
# default alone at TILE=16 (identical compiles round-over-round).
VMEM_LIMIT = None if TILE <= 16 else 96 * 1024 * 1024


def set_tile(tile: int) -> None:
    """Set the rasterizer tile edge (the `tpu.tile` config knob). Call
    BEFORE the first trace — kernels read the module globals at trace time,
    and the entry-builder caches in ops.rasterize are keyed without the
    tile, so this clears them. The rendered image is identical at any tile
    (within-tile compositing is depth-ordered regardless); only the
    entry count E and the pixel-work per entry trade off. Measured on v5e
    at the DTU protocol shape (1M gaussians, 1600x1200): tile 32 cuts E
    2.3x and the full train step 1.69x vs tile 16; at the 100k/800x600 dev
    shape tile 16 wins (small splats barely multi-tile, so 32 only pays
    4x pixel-work). A VCR_TILE env override (for A/B runs) beats the
    config: when it is set this call is a no-op."""
    global TILE, P, VMEM_LIMIT
    if "VCR_TILE" in os.environ:
        return
    if tile not in (8, 16, 32, 64):
        raise ValueError(f"tpu.tile must be one of 8/16/32/64, got {tile}")
    if tile == TILE:
        return
    TILE = tile
    P = tile * tile
    VMEM_LIMIT = None if tile <= 16 else 96 * 1024 * 1024
    from . import rasterize as _R     # deferred: rasterize imports us
    _R.clear_tile_caches()

def set_chunk(g: int) -> None:
    """A/B knob for the kernel DMA/compute chunk size G (trace-time global;
    clears the rasterize caches). Must be a multiple of BLK=128 (the
    blockwise triangular cumsum) and at most 4*ALIGN (the binning layout's
    sentinel slack, binning.aligned_budget). Larger chunks amortize the
    ~2 us/chunk fixed cost on dense tiles but coarsen both the per-tile
    padding (mean G/2 wasted slots) and the early-termination granularity."""
    global G
    if g not in (128, 256, 384, 512):
        raise ValueError(f"chunk must be one of 128/256/384/512, got {g}")
    if g == G:
        return
    G = g
    from . import rasterize as _R
    _R.clear_tile_caches()


# Precision of the three weighted-accumulation matmuls (forward feature
# accumulation `dacc`, backward `s` and `gfeat_acc`). Decided by the
# round-4 interleaved A/B (scripts/ab_acc_precision.py, AB_ACC_PRECISION
# .json, protocol shape): HIGHEST is FASTER than DEFAULT (fwd 78 vs 104 ms,
# bwd 228 vs 244 ms) — kept on speed alone. Numerically these sites are
# benign: measured through the production segment-sum, DEFAULT diverges
# only ~3e-7 of scale (scripts/ab_kernel_opts.py; an earlier "37%
# corruption" reading compared uninitialized inter-tile slack in the raw
# grad buffer and is retracted). The log-transmittance cumsum/suffix sums
# are pinned HIGHEST independently of this knob (CLAUDE.md numerics
# doctrine — those DO feed a cancellation).
ACC_PRECISION = jax.lax.Precision.HIGHEST

# Precision of the log-transmittance triangular prefix/suffix matmuls.
# These feed the exp(logT - suffix - carry) cancellation (see
# _cumsum_incl_lanes) and MUST stay at full-f32 emulation. "3x" exploits
# the 0/1 triangular operand being bf16-EXACT: split the data operand into
# three exact-bf16 terms (24 mantissa bits total) and run three DEFAULT
# passes — mathematically the same f32 product as HIGHEST but half the MXU
# passes (Mosaic rejects Precision.HIGH, so the split is manual).
TRI_PRECISION = jax.lax.Precision.HIGHEST


def _tri_dot(x, tri):
    """(P,BLK) x (BLK,BLK) f32 dot against a 0/1 matrix at TRI_PRECISION
    ('3x' = manual three-pass bf16 split, exact because tri is bf16-exact
    and each split term is exactly representable in bf16)."""
    dims = (((1,), (0,)), ((), ()))
    if TRI_PRECISION != "3x":
        return jax.lax.dot_general(x, tri, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=TRI_PRECISION)
    x1 = x.astype(jnp.bfloat16)
    r = x - x1.astype(jnp.float32)
    x2 = r.astype(jnp.bfloat16)
    x3 = (r - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    tb = tri.astype(jnp.bfloat16)

    def d(a):
        return jax.lax.dot_general(a, tb, dims,
                                   preferred_element_type=jnp.float32)
    return d(x1) + d(x2) + d(x3)


def set_acc_precision(p, tri=None) -> None:
    """A/B knob for the accumulation/triangular matmul precisions
    (trace-time globals; clears the rasterize caches)."""
    global ACC_PRECISION, TRI_PRECISION
    ACC_PRECISION = p
    if tri is not None:
        TRI_PRECISION = tri
    from . import rasterize as _R
    _R.clear_tile_caches()


# extra gradient rows appended after the packed feature rows
GROW_ABS_X = 0           # |d mean2d.x| accumulation (densification stats)
GROW_ABS_Y = 1
N_EXTRA_GRAD = 2


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def feat_rows(ch_sem: int) -> int:
    """Padded row count of the transposed feature matrix (shared by feats and
    per-entry grads; grads use two extra rows for the abs mean2d stats)."""
    return _round8(PF.feature_dim(ch_sem) + N_EXTRA_GRAD)


def out_channels(ch_sem: int) -> int:
    return 9 + ch_sem


def out_pad(ch_sem: int) -> int:
    # +2 hidden channels: per-pixel log total transmittance and the number
    # of chunks composited before early termination (both consumed by the
    # single-pass backward kernel, never exposed in the image)
    return _round8(out_channels(ch_sem) + 2)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------

def _pixel_coords(t, n_tx):
    """(P,1) float pixel x/y for tile t (alpha sampled at integer coords)."""
    ty = t // n_tx
    tx = t - ty * n_tx
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32)
    py = (ty * TILE + pix // TILE).astype(jnp.float32)
    return px, py


BLK = 128                # triangular-matmul block (the MXU native width)


def _upper_tri_incl():
    """(BLK,BLK) f32 matrix M with M[j,g] = 1 iff j <= g (inclusive cumsum).
    Prefix sums over G lanes run blockwise: one (P,BLK)x(BLK,BLK) matmul per
    block plus a (P,1) carry, halving the MXU work of a full (G,G)
    triangular matmul at G=256 (work is P*G*BLK instead of P*G*G)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    return (rows <= cols).astype(jnp.float32)


def _lower_tri_incl():
    """(BLK,BLK) f32 matrix M with M[j,g] = 1 iff j >= g (inclusive suffix
    sum along the contracted axis); see _upper_tri_incl for the blocking."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    return (rows >= cols).astype(jnp.float32)


def _cumsum_incl_lanes(x, ut):
    """(P, G) inclusive prefix sum along lanes, blockwise on the MXU.

    HIGHEST precision is load-bearing, not a nicety: the MXU's default
    matmul truncates INPUTS to bf16 (8 mantissa bits, ~0.4% relative).
    These sums carry log-transmittance terms whose forward/backward
    reconstruction cancels two large partial sums — exp(logT_final -
    suffix - carry) — so a 0.4% error on a few-hundred-magnitude log sum
    walks into the exponent and blows gradients up by e^(several) at
    saturated pixels. On chip (interpret mode computes exact f32 and never
    sees it) that systematically corrupted training and eventually drove
    params non-finite (the 400x300 schedule-rehearsal freeze at ~iter
    1100). The 0/1 triangular operand is bf16-exact, so HIGHEST costs
    only the x-operand split passes."""
    parts = []
    carry = None
    for b in range(G // BLK):
        xb = x[:, b * BLK:(b + 1) * BLK]
        cb = _tri_dot(xb, ut)
        if carry is not None:
            cb = cb + carry
        parts.append(cb)
        carry = cb[:, BLK - 1:BLK]
    return jnp.concatenate(parts, axis=1)


def _suffix_incl_lanes(x, lt):
    """(P, G) inclusive suffix sum along lanes, blockwise on the MXU."""
    nb = G // BLK
    parts = [None] * nb
    carry = None
    for b in reversed(range(nb)):
        xb = x[:, b * BLK:(b + 1) * BLK]
        sb = _tri_dot(xb, lt)
        if carry is not None:
            sb = sb + carry
        parts[b] = sb
        carry = sb[:, 0:1]
    return jnp.concatenate(parts, axis=1)


def _alpha_chunk(f, px, py, n_rem, pvalid=None):
    """Evaluate alpha for one chunk. f: (F_PAD, G) feature rows; returns
    (alpha (P,G), extras dict with dx, dy and masks for reuse in backward).
    pvalid: optional (P,1) mask of pixels inside the un-padded image (the
    CUDA rasterizer's out-of-bounds thread early-exit)."""
    mean_x = f[PF.F_MEAN_X:PF.F_MEAN_X + 1, :]       # (1, G)
    mean_y = f[PF.F_MEAN_Y:PF.F_MEAN_Y + 1, :]
    A = f[PF.F_CONIC_A:PF.F_CONIC_A + 1, :]
    B = f[PF.F_CONIC_B:PF.F_CONIC_B + 1, :]
    C = f[PF.F_CONIC_C:PF.F_CONIC_C + 1, :]
    op = f[PF.F_OPACITY:PF.F_OPACITY + 1, :]

    dx = px - mean_x                                  # (P, G)
    dy = py - mean_y
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    alpha_raw = op * jnp.exp(power)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    valid = lane < n_rem                              # entries of this tile
    live = (power <= 0.0) & (alpha_raw >= ALPHA_EPS) & valid
    if pvalid is not None:
        live = live & pvalid
    capped = alpha_raw > ALPHA_CAP
    alpha = jnp.where(live, jnp.minimum(alpha_raw, ALPHA_CAP), 0.0)
    return alpha, dict(dx=dx, dy=dy, A=A, B=B, C=C, op=op,
                       live=live, capped=capped, power=power)


def _depth_chunk(f, px, py, cam, depth_mode: str):
    """Per-(pixel, gaussian) depth d (rows, G); rows = px.shape[0] (the
    full tile or one consensus strip)."""
    if depth_mode == "traditional":
        return jnp.broadcast_to(f[PF.F_DEPTH_Z:PF.F_DEPTH_Z + 1, :],
                                (px.shape[0], G)), None
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    dirx = (px + 0.5 - cx) / fx                       # (P,1)
    diry = (py + 0.5 - cy) / fy
    inv_n = jax.lax.rsqrt(dirx * dirx + diry * diry + 1.0)
    dirx, diry, dirz = dirx * inv_n, diry * inv_n, inv_n
    nx = f[PF.F_NORMAL:PF.F_NORMAL + 1, :]
    ny = f[PF.F_NORMAL + 1:PF.F_NORMAL + 2, :]
    nz = f[PF.F_NORMAL + 2:PF.F_NORMAL + 3, :]
    denom_raw = dirx * nx + diry * ny + dirz * nz     # (P,G)
    clamped = jnp.abs(denom_raw) < 1e-2
    denom = jnp.where(clamped,
                      jnp.where(denom_raw < 0, -1e-2, 1e-2), denom_raw)
    d = f[PF.F_PLANE_D:PF.F_PLANE_D + 1, :] / denom
    return d, dict(denom=denom, clamped=clamped,
                   dirx=dirx, diry=diry, dirz=dirz)


def _transmittance(alpha, ut):
    """Returns (trans_excl (P,G), chunk_total (P,1), chunk_log (P,1)) where
    trans_excl[p,g] = prod_{j<g within chunk} (1-alpha), chunk_total = prod
    over the chunk, chunk_log = its log."""
    lg = jnp.log1p(-alpha)
    csum_incl = _cumsum_incl_lanes(lg, ut)
    trans_excl = jnp.exp(csum_incl - lg)
    chunk_log = csum_incl[:, G - 1:G]
    return trans_excl, jnp.exp(chunk_log), chunk_log


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, cam_ref, feats_ref, out_ref, buf,
                acc_ref, kref, sems, *, ch_sem: int, depth_mode: str,
                n_tx: int):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    start = pl.multiple_of(starts_ref[t], ALIGN)   # aligned tile region start
    n = counts_ref[t]
    nchunks = (n + G - 1) // G

    px, py = _pixel_coords(t, n_tx)
    ut = _upper_tri_incl()
    cam = cam_ref
    c_acc = 6 + ch_sem       # matmul-composited channels: rgb, normal, sem
    c_pad = out_pad(ch_sem)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(start + k * G, G)], buf.at[slot],
            sems.at[slot])

    # Cross-tile chunk-0 streaming: at 1-2 chunks/tile (the steady-state
    # densified scene) an in-tile double buffer leaves every tile's first
    # DMA latency exposed (~2.2us/tile measured = the dominant kernel cost).
    # Tile t's chunk 0 lives in slot 2+(t%2), prefetched by the PREVIOUS
    # grid step (the parity alternation keeps the prefetch from overwriting
    # the chunk being composited); chunks 1.. run the classic in-tile double
    # buffer on slots 0/1. Every tile — empty ones included — waits its
    # chunk-0 prefetch exactly once and issues exactly one for the next
    # tile, keeping each DMA semaphore paired. The binning layout guarantees
    # reads stay in-bounds for any tile (sentinel slack block,
    # binning.aligned_budget).
    s0 = 2 + (t % 2)
    @pl.when(t == 0)
    def _():
        get_dma(s0, 0).start()
    get_dma(s0, 0).wait()

    @pl.when(t + 1 < nt)
    def _():
        nstart = pl.multiple_of(starts_ref[t + 1], ALIGN)
        pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(nstart, G)], buf.at[2 + ((t + 1) % 2)],
            sems.at[2 + ((t + 1) % 2)]).start()

    # accumulators live in VMEM scratch so the early-termination guard is a
    # pure pl.when (a lax.cond carry would copy every accumulator per chunk)
    # columns: [t_carry, logt, acc_d, acc_d2, acc(c_acc)]
    acc_ref[:] = jnp.concatenate(
        [jnp.ones((P, 1), jnp.float32),
         jnp.zeros((P, 3 + c_acc), jnp.float32)], axis=1)
    ns = _n_strips()
    sp = P // ns
    for s in range(ns):
        kref[s] = 0

    def body(k, _):
        slot = jnp.where(k == 0, s0, (k - 1) % 2)

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma(k % 2, k + 1).start()

        @pl.when(k > 0)
        def _():
            get_dma(slot, k).wait()

        # per-strip consensus: each STRIP_ROWS-pixel row block composites
        # only while ITS max transmittance is live (forward.cu's per-block
        # __syncthreads_count consensus, at finer granularity)
        for s in range(ns):
            r0 = s * sp
            t_carry = acc_ref[r0:r0 + sp, 0:1]

            @pl.when(jnp.max(t_carry) >= T_EPS)
            def _(s=s, r0=r0, t_carry=t_carry):
                f = buf[slot]                          # (F_PAD, G)
                alpha, ex = _alpha_chunk(f, px[r0:r0 + sp], py[r0:r0 + sp],
                                         n - k * G)
                trans_excl, chunk_total, chunk_log = _transmittance(alpha, ut)
                w = alpha * trans_excl * t_carry       # (sp,G)

                # features to composite: rows [normal(3), rgb(3), sem(S)]
                fsub = f[PF.F_NORMAL:PF.F_NORMAL + c_acc, :]  # (c_acc, G)
                dacc = jax.lax.dot_general(
                    w, fsub, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=ACC_PRECISION)           # (sp, c_acc)

                d, _ = _depth_chunk(f, px[r0:r0 + sp], py[r0:r0 + sp], cam,
                                    depth_mode)
                wd = w * d
                prev = acc_ref[r0:r0 + sp, :]
                acc_ref[r0:r0 + sp, :] = jnp.concatenate(
                    [t_carry * chunk_total,
                     prev[:, 1:2] + chunk_log,
                     prev[:, 2:3] + jnp.sum(wd, axis=1, keepdims=True),
                     prev[:, 3:4] + jnp.sum(wd * d, axis=1, keepdims=True),
                     prev[:, 4:] + dacc], axis=1)
                kref[s] = kref[s] + 1

        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    row = acc_ref[:]
    t_final, logt = row[:, 0:1], row[:, 1:2]
    acc_d, acc_d2, acc = row[:, 2:3], row[:, 3:4], row[:, 4:]
    # per-strip composited-chunk counts, broadcast over each strip's rows
    if ns == 1:
        k_done = jnp.zeros((P, 1), jnp.float32) + kref[0].astype(jnp.float32)
    else:
        k_done = jnp.concatenate(
            [jnp.zeros((sp, 1), jnp.float32) + kref[s].astype(jnp.float32)
             for s in range(ns)], axis=0)

    # acc columns: [nx,ny,nz, r,g,b, sem...]  (feature-row order 8..)
    bg = jnp.stack([cam[4], cam[5], cam[6]])[None, :]  # (1,3)
    rgb = acc[:, 3:6] + t_final * bg
    # hidden channels right after the public ones: log total transmittance
    # and the per-strip early-termination chunk counts (ints stored as
    # float, broadcast over each strip's rows)
    cols = [rgb, acc[:, 0:3], acc_d, acc_d2, 1.0 - t_final]
    if ch_sem:
        cols.append(acc[:, 6:6 + ch_sem])
    cols.append(logt)
    cols.append(k_done)
    n_pad = c_pad - out_channels(ch_sem) - 2
    if n_pad:
        cols.append(jnp.zeros((P, n_pad), jnp.float32))
    out_ref[0] = jnp.concatenate(cols, axis=1)


def rasterize_forward(feats_t: jnp.ndarray, tile_starts: jnp.ndarray,
                      tile_counts: jnp.ndarray, cam: jnp.ndarray, n_tx: int, n_ty: int, ch_sem: int,
                      depth_mode: str) -> jnp.ndarray:
    """feats_t: (F_PAD, E_pad) transposed packed sorted features.
    cam: (8,) [fx, fy, cx, cy, bg_r, bg_g, bg_b, 0].
    Returns (T, P, C_PAD)."""
    num_tiles = n_tx * n_ty
    c_pad = out_pad(ch_sem)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, c_pad), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, feats_t.shape[0], G), jnp.float32),
            pltpu.VMEM((P, 4 + 6 + ch_sem), jnp.float32),
            pltpu.SMEM((_n_strips(),), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, ch_sem=ch_sem,
                               depth_mode=depth_mode, n_tx=n_tx)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P, c_pad), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(tile_starts, tile_counts, cam, feats_t)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, cam_ref, feats_ref, gout_ref,
                out_ref_fwd, gfeat_ref, buf, gbuf, carr_ref, pend_ref, sems,
                wsem, *, ch_sem: int, depth_mode: str, n_tx: int):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    start = pl.multiple_of(starts_ref[t], ALIGN)   # aligned tile region start
    n = counts_ref[t]
    nchunks = (n + G - 1) // G

    px, py = _pixel_coords(t, n_tx)
    ut = _upper_tri_incl()
    cam = cam_ref
    c_acc = 6 + ch_sem
    gout = gout_ref[0]                                 # (P, C_PAD)
    g_rgb = gout[:, 0:3]
    g_nrm = gout[:, 3:6]
    g_d = gout[:, 6:7]
    g_d2 = gout[:, 7:8]
    g_al = gout[:, 8:9]
    # gradient w.r.t. composited feature columns in row order 8.. :
    # [normal(3), rgb(3), sem(S)]
    if ch_sem:
        g_sem = gout[:, 9:9 + ch_sem]
        g_acc = jnp.concatenate([g_nrm, g_rgb, g_sem], axis=1)   # (P, c_acc)
    else:
        g_acc = jnp.concatenate([g_nrm, g_rgb], axis=1)

    # hidden channels from the forward: per-pixel log total transmittance
    # and the per-strip number of chunks composited before early termination
    oc = out_channels(ch_sem)
    logt_final = out_ref_fwd[0][:, oc:oc + 1]
    t_final = jnp.exp(logt_final)
    ns = _n_strips()
    sp = P // ns
    k_lim = [jnp.max(out_ref_fwd[0][s * sp:(s + 1) * sp, oc + 1:oc + 2]
                     ).astype(jnp.int32) for s in range(ns)]
    bg = jnp.stack([cam[4], cam[5], cam[6]])[None, :]
    b_pix = jnp.sum(bg * g_rgb, axis=1, keepdims=True) - g_al     # (P,1)
    tb = t_final * b_pix
    lt = _lower_tri_incl()

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(start + k * G, G)], buf.at[slot],
            sems.at[slot])

    # ---- single reverse pass: transmittance reconstructed in log space ----
    # trans_excl[g] = exp(logT_final - sum_{j>=g} log(1-alpha_j)), with the
    # suffix split into the in-chunk part (lower-triangular matmul) and the
    # across-chunk carry. This replaces the two-pass (totals + prefix) walk.
    #
    # Cross-tile streaming (mirror of the forward, see _fwd_kernel): the
    # reverse walk starts at the LAST chunk, which slot 2+(t%2) holds,
    # prefetched by the previous grid step; write-back DMAs are drained
    # lazily — a persistent pend flag per slot defers the wait to the next
    # overwrite (possibly in the next tile's step) instead of stalling at
    # every tile's end; the final grid step drains both.
    s0 = 2 + (t % 2)

    @pl.when(t == 0)
    def _():
        pend_ref[0] = 0
        pend_ref[1] = 0
        get_dma(s0, jnp.maximum(nchunks - 1, 0)).start()
    get_dma(s0, jnp.maximum(nchunks - 1, 0)).wait()

    @pl.when(t + 1 < nt)
    def _():
        nstart = pl.multiple_of(starts_ref[t + 1], ALIGN)
        nlast = jnp.maximum((counts_ref[t + 1] + G - 1) // G - 1, 0)
        pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(nstart + nlast * G, G)],
            buf.at[2 + ((t + 1) % 2)], sems.at[2 + ((t + 1) % 2)]).start()

    # reverse-walk carries [log_r, suffix_u] in VMEM scratch so the
    # early-termination guard is a pure pl.when (no lax.cond carry copies)
    carr_ref[:] = jnp.zeros((P, 2), jnp.float32)

    def body2(i, _):
        k = nchunks - 1 - i
        slot = jnp.where(i == 0, s0, (i - 1) % 2)

        @pl.when(i + 1 < nchunks)
        def _():
            get_dma(i % 2, k - 1).start()

        @pl.when(i > 0)
        def _():
            get_dma(slot, k).wait()
        nfeat = PF.feature_dim(ch_sem)
        grows = gbuf.shape[1]

        wslot = i % 2
        # lazily drain the previous write on this slot (this tile's i-2, or
        # the previous tile's tail) before overwriting the buffer
        @pl.when(pend_ref[wslot] == 1)
        def _():
            pltpu.make_async_copy(
                gbuf.at[wslot],
                gfeat_ref.at[:, pl.ds(start + k * G, G)],  # size-alike only
                wsem.at[wslot]).wait()

        # zero-init the per-entry grad rows, then each live strip ADDS its
        # partial reductions (strips partition the pixel axis, so the sums
        # compose); strips whose forward terminated before chunk k skip —
        # their pixels' grads for these entries are exactly the forward's
        # dropped sub-T_EPS contributions (CUDA-fork per-pixel rule)
        gbuf[wslot] = jnp.zeros((grows, G), jnp.float32)
        for st in range(ns):
            r0 = st * sp
            rs = slice(r0, r0 + sp)

            @pl.when(k < k_lim[st])
            def _(st=st, r0=r0, rs=rs):
                f = buf[slot]
                log_r = carr_ref[rs, 0:1]              # over chunks > k
                suffix_u = carr_ref[rs, 1:2]
                alpha, ex = _alpha_chunk(f, px[rs], py[rs], n - k * G)
                lg = jnp.log1p(-alpha)
                suf_incl = _suffix_incl_lanes(lg, lt)  # sum_{j>=g in chunk}
                v = jnp.exp(logt_final[rs] - suf_incl - log_r)
                w = alpha * v
                d, dex = _depth_chunk(f, px[rs], py[rs], cam, depth_mode)
                fsub = f[PF.F_NORMAL:PF.F_NORMAL + c_acc, :]
                s = jax.lax.dot_general(g_acc[rs], fsub,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=ACC_PRECISION)
                s = s + d * (g_d[rs] + d * g_d2[rs])

                u = w * s
                u_suf_incl = _suffix_incl_lanes(u, lt)
                suffix = (u_suf_incl - u) + suffix_u   # sum over later entries

                dalpha = v * s - (suffix + tb[rs]) / (1.0 - alpha)
                dalpha = jnp.where(ex["live"], dalpha, 0.0)
                dpw = jnp.where(ex["capped"], 0.0, dalpha * alpha)  # d power

                # ---- reduce to per-entry rows (1, G) ----
                # share the per-pair products across the six geometry
                # reductions (the kernel is VPU-op-bound, §7.1c): u1/u2
                # feed both the mean grads and their |.| densify stats;
                # t1/t2 feed all three conic grads with the -0.5/-1
                # constants folded into the reduced (1, G) rows
                gxa = ex["A"] * ex["dx"] + ex["B"] * ex["dy"]
                gya = ex["C"] * ex["dy"] + ex["B"] * ex["dx"]
                u1 = dpw * gxa
                u2 = dpw * gya
                g_meanx = jnp.sum(u1, axis=0, keepdims=True)
                g_meany = jnp.sum(u2, axis=0, keepdims=True)
                g_absx = jnp.sum(jnp.abs(u1), axis=0, keepdims=True)
                g_absy = jnp.sum(jnp.abs(u2), axis=0, keepdims=True)
                t1 = dpw * ex["dx"]
                t2 = dpw * ex["dy"]
                g_ca = -0.5 * jnp.sum(t1 * ex["dx"], axis=0, keepdims=True)
                g_cb = -jnp.sum(t1 * ex["dy"], axis=0, keepdims=True)
                g_cc = -0.5 * jnp.sum(t2 * ex["dy"], axis=0, keepdims=True)
                op_safe = jnp.maximum(ex["op"], 1e-12)
                # dpw IS where(capped, 0, dalpha*alpha) — reuse it
                g_op = jnp.sum(dpw, axis=0, keepdims=True) / op_safe

                # feature grads (c_acc, G): sum_p w * g_acc
                gfeat_acc = jax.lax.dot_general(
                    g_acc[rs], w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=ACC_PRECISION)           # (c_acc, G)

                # depth grads
                gd_pg = w * (g_d[rs] + 2.0 * d * g_d2[rs])   # (sp,G)
                if depth_mode == "traditional":
                    g_z = jnp.sum(gd_pg, axis=0, keepdims=True)
                    g_pd = jnp.zeros((1, G), jnp.float32)
                    g_n = jnp.zeros((3, G), jnp.float32)
                else:
                    denom = dex["denom"]
                    inv_den = 1.0 / denom
                    g_pd = jnp.sum(gd_pg * inv_den, axis=0, keepdims=True)
                    # where the |ray.normal| >= 1e-2 clamp was active the
                    # denominator is a constant: no gradient flows to the
                    # normal (matches autodiff of the clamp; an unguarded
                    # 1/denom^2 would amplify by up to 1e4)
                    coef = jnp.where(
                        dex["clamped"], 0.0,
                        gd_pg * (-f[PF.F_PLANE_D:PF.F_PLANE_D + 1, :])
                        * inv_den * inv_den)
                    g_n = jnp.concatenate(
                        [jnp.sum(coef * dex["dirx"], axis=0, keepdims=True),
                         jnp.sum(coef * dex["diry"], axis=0, keepdims=True),
                         jnp.sum(coef * dex["dirz"], axis=0, keepdims=True)],
                        axis=0)
                    g_z = jnp.zeros((1, G), jnp.float32)

                # rows 0..7: fixed geometry grads (packed feature order);
                # rows 8..8+c_acc: composited-feature grads (normal, rgb,
                # sem), the normal rows also receiving the intersection-
                # depth term; rows nfeat+0/1: |d mean2d| densification
                # stats; zero padding.
                if depth_mode != "traditional":
                    gmid = jnp.concatenate([gfeat_acc[:3] + g_n,
                                            gfeat_acc[3:]], axis=0)
                else:
                    gmid = gfeat_acc
                rows = [g_meanx, g_meany, g_ca, g_cb, g_cc, g_op, g_z, g_pd,
                        gmid, g_absx, g_absy]
                n_pad = grows - (nfeat + N_EXTRA_GRAD)
                if n_pad:
                    rows.append(jnp.zeros((n_pad, G), jnp.float32))
                gbuf[wslot] = gbuf[wslot] + jnp.concatenate(rows, axis=0)
                carr_ref[rs, :] = jnp.concatenate(
                    [log_r + suf_incl[:, 0:1], suffix_u + u_suf_incl[:, 0:1]],
                    axis=1)

        pltpu.make_async_copy(
            gbuf.at[wslot], gfeat_ref.at[:, pl.ds(start + k * G, G)],
            wsem.at[wslot]).start()
        pend_ref[wslot] = 1

        return 0

    jax.lax.fori_loop(0, nchunks, body2, 0)

    # last grid step: drain whatever writes are still in flight
    @pl.when(t + 1 >= nt)
    def _():
        for s in (0, 1):
            @pl.when(pend_ref[s] == 1)
            def _(s=s):
                pltpu.make_async_copy(
                    gbuf.at[s], gfeat_ref.at[:, pl.ds(start, G)],
                    wsem.at[s]).wait()


def rasterize_backward(feats_t, tile_starts, tile_counts, cam, gout_tiles,
                       out_tiles, n_tx, n_ty, ch_sem: int, depth_mode: str):
    """gout_tiles: (T, P, C_PAD) upstream grads; out_tiles: the forward's
    output (for the hidden logT channel). Returns per-entry grads
    (F_PAD, E_pad) in the packed layout (+2 abs-mean rows)."""
    num_tiles = n_tx * n_ty
    f_pad = feats_t.shape[0]
    e_pad = feats_t.shape[1]
    c_pad = out_pad(ch_sem)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P, c_pad), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, c_pad), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, f_pad, G), jnp.float32),
            pltpu.VMEM((2, f_pad, G), jnp.float32),
            pltpu.VMEM((P, 2), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, ch_sem=ch_sem,
                               depth_mode=depth_mode, n_tx=n_tx)
    gfeat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, e_pad), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=VMEM_LIMIT),
    )(tile_starts, tile_counts, cam, feats_t, gout_tiles, out_tiles)
    return gfeat


# ---------------------------------------------------------------------------
# per-entry visibility / importance stats (f_count render modes)
# ---------------------------------------------------------------------------

def _stats_kernel(starts_ref, counts_ref, cam_ref, feats_ref, stats_ref, buf,
                  gbuf, carr_ref, sems, wsem, *, n_tx: int, width: int,
                  height: int):
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], ALIGN)   # aligned tile region start
    n = counts_ref[t]
    nchunks = (n + G - 1) // G
    px, py = _pixel_coords(t, n_tx)
    pvalid = (px < width) & (py < height)
    ut = _upper_tri_incl()

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(start + k * G, G)], buf.at[slot],
            sems.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    carr_ref[:] = jnp.ones((P, 1), jnp.float32)    # transmittance carry

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        wslot = k % 2

        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(
                gbuf.at[wslot], stats_ref.at[:, pl.ds(start + (k - 2) * G, G)],
                wsem.at[wslot]).wait()

        t_carry = carr_ref[:]
        alive = jnp.max(t_carry) >= T_EPS

        @pl.when(alive)
        def _():
            f = buf[slot]
            alpha, ex = _alpha_chunk(f, px, py, n - k * G, pvalid)
            trans_excl, chunk_total, _ = _transmittance(alpha, ut)
            w = alpha * trans_excl * t_carry
            count = jnp.sum(ex["live"].astype(jnp.float32), axis=0,
                            keepdims=True)
            imp = jnp.sum(w, axis=0, keepdims=True)
            gbuf[wslot] = jnp.concatenate(
                [count, imp, jnp.zeros((6, G), jnp.float32)], axis=0)
            carr_ref[:] = t_carry * chunk_total

        @pl.when(jnp.logical_not(alive))
        def _():
            # early-terminated (CUDA parity): no hits past saturation
            gbuf[wslot] = jnp.zeros((8, G), jnp.float32)

        pltpu.make_async_copy(
            gbuf.at[wslot], stats_ref.at[:, pl.ds(start + k * G, G)],
            wsem.at[wslot]).start()
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    def drain(k):
        @pl.when((k >= 0) & (k < nchunks))
        def _():
            pltpu.make_async_copy(
                gbuf.at[k % 2], stats_ref.at[:, pl.ds(start + k * G, G)],
                wsem.at[k % 2]).wait()

    drain(nchunks - 2)
    drain(nchunks - 1)


def rasterize_stats(feats_t, tile_starts, tile_counts, cam, n_tx, n_ty,
                    width=None, height=None):
    """Per-entry (count, importance) stats -> (8, E_pad); rows 0=pixel hit
    count, 1=sum of blending weights (LightGaussian importance,
    tools/prune.py:25-47 consumers)."""
    num_tiles = n_tx * n_ty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, feats_t.shape[0], G), jnp.float32),
            pltpu.VMEM((2, 8, G), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if width is None:
        width = n_tx * TILE
    if height is None:
        height = n_ty * TILE
    kernel = functools.partial(_stats_kernel, n_tx=n_tx, width=width,
                               height=height)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, feats_t.shape[1]), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=VMEM_LIMIT),
    )(tile_starts, tile_counts, cam, feats_t)
