"""Pure-JAX reference compositor (oracle).

Brute-force O(N * H * W) front-to-back alpha compositing over depth-sorted
Gaussians. Differentiable end-to-end via JAX autodiff. Used as:
  * the semantic definition the Pallas kernel is unit-tested against,
  * a fallback path for tiny scenes / debugging on CPU.

Output channel layout (C-major, (C_out, H, W)):
  0:3  rgb (background-blended)
  3:6  composited camera-space normal (no bg)
  6    depth  (sum w * d)
  7    depth^2 (sum w * d^2)
  8    alpha  (sum w == 1 - T_final)
  9:   semantic features (S channels)
This matches the reference fork's rendered_out channel stack
(gaussian_renderer/__init__.py:122-162) with (depth, depth^2) always present
so depth_var/distortion derive outside the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import projection as P

ALPHA_EPS = 1.0 / 255.0
ALPHA_CAP = 0.99


def out_channels(ch_sem: int) -> int:
    return 9 + ch_sem


def composite_reference(
    feats: jnp.ndarray,          # (N, F) packed per-Gaussian features
    order: jnp.ndarray,          # (N,) depth order (front first); may mask with N
    height: int,
    width: int,
    bg: jnp.ndarray,             # (3,)
    ch_sem: int,
    depth_mode: str = "traditional",   # or "intersection"
    cam_k: jnp.ndarray | None = None,  # (4,) fx, fy, cx, cy for intersection dirs
) -> jnp.ndarray:
    n, F = feats.shape
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, F), feats.dtype)], axis=0)
    f = feats_pad[order]                                  # (N, F) sorted, pad=0

    # alpha is sampled at integer pixel coordinates (the 3DGS CUDA
    # convention); ray directions use half-pixel centers (the reference's
    # get_all_px_dir convention).
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    pxf = px.reshape(-1)                                  # (P,)
    pyf = py.reshape(-1)

    dx = pxf[:, None] - f[None, :, P.F_MEAN_X]            # (P, N)
    dy = pyf[:, None] - f[None, :, P.F_MEAN_Y]
    A, B, C = f[:, P.F_CONIC_A], f[:, P.F_CONIC_B], f[:, P.F_CONIC_C]
    power = -0.5 * (A[None] * dx * dx + C[None] * dy * dy) - B[None] * dx * dy
    alpha = f[None, :, P.F_OPACITY] * jnp.exp(power)
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, jnp.minimum(alpha, ALPHA_CAP))

    one_minus = 1.0 - alpha
    cum = jnp.cumprod(one_minus, axis=1)
    trans_excl = jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    w = alpha * trans_excl                                # (P, N)
    t_final = jnp.prod(one_minus, axis=1)                 # (P,)

    # depth per (pixel, gaussian)
    if depth_mode == "intersection":
        fx, fy, cx, cy = cam_k[0], cam_k[1], cam_k[2], cam_k[3]
        dirx = (pxf + 0.5 - cx) / fx
        diry = (pyf + 0.5 - cy) / fy
        inv_norm = 1.0 / jnp.sqrt(dirx * dirx + diry * diry + 1.0)
        dirx, diry, dirz = dirx * inv_norm, diry * inv_norm, inv_norm
        nx, ny, nz = (f[:, P.F_NORMAL], f[:, P.F_NORMAL + 1], f[:, P.F_NORMAL + 2])
        denom = (dirx[:, None] * nx[None] + diry[:, None] * ny[None]
                 + dirz[:, None] * nz[None])
        denom = jnp.where(jnp.abs(denom) < 1e-2,
                          jnp.where(denom < 0, -1e-2, 1e-2), denom)
        d = f[None, :, P.F_PLANE_D] / denom
    else:
        d = jnp.broadcast_to(f[None, :, P.F_DEPTH_Z], w.shape)

    rgb = w @ f[:, P.F_RGB:P.F_RGB + 3]                   # (P,3)
    rgb = rgb + t_final[:, None] * bg[None, :]
    nrm = w @ f[:, P.F_NORMAL:P.F_NORMAL + 3]
    depth = jnp.sum(w * d, axis=1)
    depth2 = jnp.sum(w * d * d, axis=1)
    alpha_out = jnp.sum(w, axis=1)
    chans = [rgb.T.reshape(3, height, width),
             nrm.T.reshape(3, height, width),
             depth.reshape(1, height, width),
             depth2.reshape(1, height, width),
             alpha_out.reshape(1, height, width)]
    if ch_sem:
        sem = w @ f[:, P.F_SEM:P.F_SEM + ch_sem]
        chans.append(sem.T.reshape(ch_sem, height, width))
    return jnp.concatenate(chans, axis=0)


def depth_order(depth_z: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back order of visible Gaussians; culled ones sort to the end
    and index the zero pad row."""
    n = depth_z.shape[0]
    key = jnp.where(radius > 0, depth_z, jnp.inf)
    order = jnp.argsort(key)
    return jnp.where(jnp.isinf(key[order]), n, order)
