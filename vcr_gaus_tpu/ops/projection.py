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
    ext: jnp.ndarray         # (N,2) per-axis binning extents (pixels); the
                             # AABB of the alpha >= 1/255 level ellipse —
                             # tighter than the circular radius, image- and
                             # gradient-exact (outside pixels are masked
                             # dead by the kernels' ALPHA_EPS test)


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
    opacity: jnp.ndarray | None = None,
) -> Projected:
    """Project Gaussians to screen space.

    Culling / radius / low-pass behavior matches the 3DGS rasterizer contract:
    near-plane cull at z<=0.2, EWA Jacobian with ±1.3*tanfov frustum clamp,
    +0.3px isotropic dilation, radius = ceil(3 sqrt(lambda_max)).

    `opacity` (optional, (N,)) tightens the per-axis binning extents to the
    AABB of the alpha = 1/255 level set (exp(-power) support); without it the
    extents are the 3-sigma AABB. Either is exact w.r.t. the composite: the
    kernels mask alpha < 1/255 to zero, so entries binned outside the support
    contribute neither pixels nor gradients. The reported circular `radius`
    stays the reference's ceil(3 sqrt(lambda_max)) (it feeds max_radii2D
    densification stats and size pruning, trainer.py:343-374 semantics).
    """
    # Everything below is explicit scalar-component algebra over (N,)
    # vectors: batched 3x3 matmuls (the natural torch/CUDA phrasing) lower to
    # MXU ops with 3->128 contraction padding on TPU, ~40x wasted FLOPs and a
    # measured ~8ms at N=131k; the expanded form is pure VPU elementwise that
    # XLA fuses into one pass.
    from ..utils.math import safe_normalize

    x, y, z3 = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    V = viewmatrix

    # camera-space position: [x y z 1] @ V (row-vector convention)
    tx = x * V[0, 0] + y * V[1, 0] + z3 * V[2, 0] + V[3, 0]
    ty = x * V[0, 1] + y * V[1, 1] + z3 * V[2, 1] + V[3, 1]
    tz = x * V[0, 2] + y * V[1, 2] + z3 * V[2, 2] + V[3, 2]
    p_view = jnp.stack([tx, ty, tz], axis=-1)

    Pm = projmatrix
    cx = x * Pm[0, 0] + y * Pm[1, 0] + z3 * Pm[2, 0] + Pm[3, 0]
    cy = x * Pm[0, 1] + y * Pm[1, 1] + z3 * Pm[2, 1] + Pm[3, 1]
    cw = x * Pm[0, 3] + y * Pm[1, 3] + z3 * Pm[2, 3] + Pm[3, 3]
    p_w = 1.0 / (cw + 1e-7)

    # rotation matrix components from the (normalized) quaternion
    q = safe_normalize(quats)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = scales[:, 0] * scale_modifier
    s1 = scales[:, 1] * scale_modifier
    s2 = scales[:, 2] * scale_modifier

    # EWA projection to 2D
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
    txtz = jnp.clip(tx / tz_safe, -lim_x, lim_x) * tz
    tytz = jnp.clip(ty / tz_safe, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]; T = J @ W^T where
    # W = V[:3,:3] is the world->cam rotation (W3[i,j] = V[j,i]).
    j00 = fx * inv_z
    j02 = -fx * txtz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tytz * inv_z2
    t00 = j00 * V[0, 0] + j02 * V[0, 2]
    t01 = j00 * V[1, 0] + j02 * V[1, 2]
    t02 = j00 * V[2, 0] + j02 * V[2, 2]
    t10 = j11 * V[0, 1] + j12 * V[0, 2]
    t11 = j11 * V[1, 1] + j12 * V[1, 2]
    t12 = j11 * V[2, 1] + j12 * V[2, 2]

    # U = T @ (R diag(s)); cov2d = U U^T (Sigma = R S S^T R^T pulled through)
    m00 = t00 * r00 + t01 * r10 + t02 * r20
    m01 = t00 * r01 + t01 * r11 + t02 * r21
    m02 = t00 * r02 + t01 * r12 + t02 * r22
    m10 = t10 * r00 + t11 * r10 + t12 * r20
    m11 = t10 * r01 + t11 * r11 + t12 * r21
    m12 = t10 * r02 + t11 * r12 + t12 * r22
    u00, u01, u02 = m00 * s0, m01 * s1, m02 * s2
    u10, u11, u12 = m10 * s0, m11 * s1, m12 * s2

    a = u00 * u00 + u01 * u01 + u02 * u02 + 0.3
    b = u00 * u10 + u01 * u11 + u02 * u12
    c = u10 * u10 + u11 * u11 + u12 * u12 + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # per-axis extents: AABB of {0.5 x^T Sigma2d^{-1} x = L} is
    # (sqrt(2 L Sigma_xx), sqrt(2 L Sigma_yy)); L = ln(255 op) is where
    # alpha crosses the kernels' 1/255 cutoff (L = 4.5 reproduces 3 sigma)
    if opacity is None:
        lvl = 4.5
    else:
        lvl = jnp.clip(jnp.log(255.0 * jnp.maximum(opacity, 1e-12)), 0.0,
                       4.5)
    ext_x = jnp.ceil(jnp.sqrt(2.0 * lvl * a))
    ext_y = jnp.ceil(jnp.sqrt(2.0 * lvl * c))
    if opacity is not None:
        dead = opacity * 255.0 <= 1.0
        ext_x = jnp.where(dead, 0.0, ext_x)
        ext_y = jnp.where(dead, 0.0, ext_y)

    mean2d = jnp.stack(
        [((cx * p_w + 1.0) * width - 1.0) * 0.5,
         ((cy * p_w + 1.0) * height - 1.0) * 0.5],
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
    keep = (visible & in_image)[:, None]
    ext = jax.lax.stop_gradient(
        jnp.where(keep, jnp.stack([ext_x, ext_y], axis=-1), 0.0))

    return Projected(mean2d=mean2d, conic=conic, depth_z=p_view[:, 2],
                     radius=radius, mean_cam=p_view, ext=ext)


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
