"""Camera/projection math.

Matches the reference conventions (tools/graphics_utils.py): 4x4 transforms
are stored ROW-VECTOR style (i.e. transposed vs. column convention), points
transform as ``p_out = p_hom @ M``; the projection matrix is the 3DGS/GLM one
with z in [0,1]. Host-side constructors are numpy; the per-pixel helpers are
JAX.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.zeros(3), scale=1.0) -> np.ndarray:
    """World->camera 4x4 (column convention), with the reference's optional
    recentering (tools/graphics_utils.py:38-49). ``R`` is the camera-to-world
    rotation as stored by the COLMAP reader (transposed extrinsic)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.float32(np.linalg.inv(C2W))


def projection_matrix(znear, zfar, fovx, fovy) -> np.ndarray:
    """3DGS perspective projection (tools/graphics_utils.py:63-86); column
    convention."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def intrinsic_matrix(fovx, fovy, h, w) -> np.ndarray:
    """Pixel intrinsics with the principal point at the image center
    (tools/graphics_utils.py:89-101)."""
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = fov2focal(fovx, w)
    K[1, 1] = fov2focal(fovy, h)
    K[0, 2] = w / 2
    K[1, 2] = h / 2
    return K


def pixel_dirs(K, height, width):
    """Per-pixel unit ray directions in camera space, (H, W, 3).

    Reference: tools/graphics_utils.py:143-155 (get_all_px_dir), which maps
    pixel centers through K^-1 at depth 1 and normalizes. NB the reference's
    NDC convention puts pixel (i,j) at ((j+0.5), (i+0.5)) in pixel units."""
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    d = jnp.stack([(px - cx) / fx, (py - cy) / fy, jnp.ones_like(px)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def depth_to_points_cam(depth, K):
    """Back-project a (H,W) z-depth map to camera-space points (H,W,3)
    (tools/graphics_utils.py:120-131)."""
    H, W = depth.shape
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (px - cx) / fx * depth
    y = (py - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def depth_to_points_world(depth, K, w2c_rowmajor):
    """Back-project to world space. ``w2c_rowmajor`` is the row-vector-style
    (transposed) world->camera transform as stored on cameras."""
    cam = depth_to_points_cam(depth, K)
    c2w = jnp.linalg.inv(w2c_rowmajor.T)
    hom = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], axis=-1)
    world = hom @ c2w.T
    return cam, world[..., :3]


def compute_normals_from_depth(depth, K):
    """Depth map -> camera-space normals via the cross product of image-space
    gradients of the back-projected point cloud (tools/normal_utils.py:30-41).

    Central differences in the interior, one-sided at the borders (the
    torch.gradient convention)."""
    pts = depth_to_points_cam(depth, K)

    def grad_axis(a, axis):
        n = a.shape[axis]
        take = lambda sl: jax.lax.slice_in_dim(a, sl.start, sl.stop, axis=axis)
        interior = (take(slice(2, n)) - take(slice(0, n - 2))) / 2.0
        first = take(slice(1, 2)) - take(slice(0, 1))
        last = take(slice(n - 1, n)) - take(slice(n - 2, n - 1))
        return jnp.concatenate([first, interior, last], axis=axis)

    dy = grad_axis(pts, 0)
    dx = grad_axis(pts, 1)
    n = jnp.cross(dx, dy)
    # eps inside the rsqrt keeps gradients finite at degenerate (flat/empty)
    # pixels — plain x/||x|| has NaN grad at 0
    return n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-24)
