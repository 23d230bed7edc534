"""3D Gaussian -> screen projection (EWA splatting), pure differentiable JAX.

Implements the projection stage of the tile rasterizer: camera transform,
frustum cull, 3D covariance from (scale, quat), EWA 2D covariance with the
low-pass +0.3px blur, conic/radius, and pixel-space means. Semantics follow
the standard 3DGS forward (the contract consumed by
gaussian_renderer/__init__.py:107-120 in the reference); this is the part the
reference runs inside forward.cu and we keep in jitted JAX so XLA fuses it
and autodiff provides its VJP.

Feature packing: the rasterizer kernel consumes one (N, F) matrix; the packed
layout is defined here (FEAT enum) and shared by the Pallas kernel, the pure
JAX oracle and the backward unpacking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Packed per-Gaussian feature layout (columns of the (N, F) feature matrix).
# ---------------------------------------------------------------------------
F_MEAN_X = 0
F_MEAN_Y = 1
F_CONIC_A = 2
F_CONIC_B = 3
F_CONIC_C = 4
F_OPACITY = 5
F_DEPTH_Z = 6    # camera-space z of the mean
F_PLANE_D = 7    # dot(normal_cam, mean_cam) for ray-plane intersection depth
F_NORMAL = 8     # 8,9,10: camera-space normal (also the splat plane normal)
F_RGB = 11       # 11,12,13
F_SEM = 14       # 14 .. 14+S-1 semantic features
N_FIXED = 14


def feature_dim(ch_sem: int) -> int:
    return N_FIXED + ch_sem


class Projected(NamedTuple):
    mean2d: jnp.ndarray      # (N,2) pixel coords
    conic: jnp.ndarray       # (N,3) inverse 2D covariance (a,b,c)
    depth_z: jnp.ndarray     # (N,) camera z
    radius: jnp.ndarray      # (N,) int32 pixel radius (0 = culled)
    mean_cam: jnp.ndarray    # (N,3) camera-space means


def project_gaussians(
    means3d: jnp.ndarray,        # (N,3)
    scales: jnp.ndarray,         # (N,3) activated (positive) scales
    quats: jnp.ndarray,          # (N,4) unnormalized quaternions
    viewmatrix: jnp.ndarray,     # (4,4) world->cam, row-vector convention
    projmatrix: jnp.ndarray,     # (4,4) full world->clip, row-vector convention
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project Gaussians to screen space.

    Culling / radius / low-pass behavior matches the 3DGS rasterizer contract:
    near-plane cull at z<=0.2, EWA Jacobian with ±1.3*tanfov frustum clamp,
    +0.3px isotropic dilation, radius = ceil(3 sqrt(lambda_max)).
    """
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    from ..utils.math import mm, quat_to_rotmat

    p_view = mm(hom, viewmatrix[:, :3])                   # (N,3) camera space
    p_clip = mm(hom, projmatrix)                          # (N,4)
    p_w = 1.0 / (p_clip[:, 3:4] + 1e-7)
    p_ndc = p_clip[:, :3] * p_w

    # 3D covariance in world space
    R = quat_to_rotmat(quats)
    S = scales * scale_modifier
    L = R * S[:, None, :]
    cov3d = mm(L, jnp.swapaxes(L, 1, 2))                  # (N,3,3)

    # EWA projection to 2D
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    tz = p_view[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -lim_x, lim_x) * tz
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * txtz * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * tytz * inv_z2], axis=-1),
        ],
        axis=1,
    )                                                     # (N,2,3)
    W3 = viewmatrix[:3, :3].T                             # world->cam rotation
    Tm = mm(J, W3)                                        # (N,2,3)
    cov2d = mm(mm(Tm, cov3d), jnp.swapaxes(Tm, 1, 2))     # (N,2,2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    mean2d = jnp.stack(
        [((p_ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
         ((p_ndc[:, 1] + 1.0) * height - 1.0) * 0.5],
        axis=-1,
    )

    visible = (tz > 0.2) & (det > 0)
    # cull splats whose extent cannot touch the image
    in_image = (
        (mean2d[:, 0] + radius_f > 0) & (mean2d[:, 0] - radius_f < width)
        & (mean2d[:, 1] + radius_f > 0) & (mean2d[:, 1] - radius_f < height)
    )
    radius = jnp.where(visible & in_image, radius_f, 0.0)
    radius = jax.lax.stop_gradient(radius).astype(jnp.int32)

    return Projected(mean2d=mean2d, conic=conic, depth_z=p_view[:, 2],
                     radius=radius, mean_cam=p_view)


def pack_features(
    proj: Projected,
    opacity: jnp.ndarray,         # (N,) activated
    rgb: jnp.ndarray,             # (N,3)
    normal_cam: jnp.ndarray | None,  # (N,3) camera-space (may be None)
    sem: jnp.ndarray | None,      # (N,S) or None
    ch_sem: int,
) -> jnp.ndarray:
    """Assemble the packed (N, F) feature matrix the raster kernel consumes."""
    n = opacity.shape[0]
    if normal_cam is None:
        normal_cam = jnp.zeros((n, 3), opacity.dtype)
    plane_d = jnp.sum(normal_cam * proj.mean_cam, axis=-1)
    cols = [
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        opacity, proj.depth_z, plane_d,
        normal_cam[:, 0], normal_cam[:, 1], normal_cam[:, 2],
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
    ]
    if ch_sem:
        assert sem is not None and sem.shape[1] == ch_sem
        cols.extend([sem[:, i] for i in range(ch_sem)])
    return jnp.stack(cols, axis=-1)
