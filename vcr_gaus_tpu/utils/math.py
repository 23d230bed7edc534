"""Core differentiable math: quaternions, covariances, schedules, box tests.

Semantics match the reference toolbox (tools/general_utils.py,
tools/math_utils.py) but everything here is jit-able JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Small geometry matmuls (3x3/4x4 per-point transforms) must be fp32-exact:
# the TPU default matmul precision is bfloat16, which shifts world coordinates
# by ~1e-2 relative — visible in splat placement. HIGHEST costs nothing here
# (K=3/4 contractions don't tile the MXU anyway).
XP = jax.lax.Precision.HIGHEST


def mm(a, b):
    """fp32-exact matmul for small geometry transforms."""
    return jnp.matmul(a, b, precision=XP)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def safe_normalize(v, eps=1e-24):
    """x / ||x|| with finite gradients at x == 0 (eps inside the sqrt) —
    needed because inactive padding slots hold zero vectors."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w,x,y,z) -> rotation matrix.

    Matches tools/general_utils.py:98-119 (build_rotation): the quaternion is
    L2-normalized first; layout (N,4) -> (N,3,3)."""
    q = safe_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def scaling_rotation_matrix(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(scale); covariance = L L^T (tools/general_utils.py:121-130)."""
    R = quat_to_rotmat(quat)
    return R * scale[..., None, :]


def covariance_from_scaling_rotation(scale, quat, modifier=1.0):
    """3D covariance as the 6 upper-triangular entries
    (xx, xy, xz, yy, yz, zz) — the layout the reference rasterizer uses
    (scene/gaussian_model.py:38-47)."""
    L = scaling_rotation_matrix(modifier * scale, quat)
    C = mm(L, jnp.swapaxes(L, -1, -2))
    return jnp.stack(
        [C[..., 0, 0], C[..., 0, 1], C[..., 0, 2],
         C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]], axis=-1
    )


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolated LR schedule with optional delay
    (tools/general_utils.py:49-82). Works on traced or python scalars."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, out)


def normalize_pts(pts, trans, scale):
    """World points -> normalized box space. ``trans`` is either a translation
    (3,) or an oriented-box 4x4 transform (tools/math_utils.py:50-58)."""
    trans = jnp.asarray(trans)
    scale = jnp.asarray(scale)
    if trans.ndim == 1:
        return (pts - trans) / scale
    return (mm(pts, trans[:3, :3].T) + trans[:3, 3]) / scale


def inv_normalize_pts(pts, trans, scale):
    trans = jnp.asarray(trans)
    scale = jnp.asarray(scale)
    if trans.ndim == 1:
        return pts * scale + trans
    return mm(pts * scale - trans[:3, 3], trans[:3, :3])


def get_inside_normalized(xyz, trans, scale, bound=1.0):
    """Inside-oriented-box test (tools/math_utils.py:70-74)."""
    pts = normalize_pts(xyz, trans, scale)
    inside = jnp.all(jnp.abs(pts) < bound, axis=-1)
    return inside, pts


def shortest_axis_normal(scale, quat):
    """Per-Gaussian normal = rotation column of the smallest scale axis
    (scene/gaussian_model.py:168-192)."""
    R = quat_to_rotmat(quat)
    axis = jnp.argmin(scale, axis=-1)
    return jnp.take_along_axis(R, axis[:, None, None].repeat(3, 1), axis=2)[..., 0]


def longest_axis_dir(scale, quat):
    """Direction + magnitude of the largest scale axis
    (scene/gaussian_model.py:569-577)."""
    R = quat_to_rotmat(quat)
    axis = jnp.argmax(scale, axis=-1)
    max_scaling = jnp.take_along_axis(scale, axis[:, None], axis=1)[:, 0]
    dirs = jnp.take_along_axis(R, axis[:, None, None].repeat(3, 1), axis=2)[..., 0]
    return dirs, max_scaling, axis


def set_axis_value(arr, axis_idx, value):
    """arr[i, axis_idx[i]] = value[i] for (N,3) arrays, functionally."""
    onehot = jax.nn.one_hot(axis_idx, arr.shape[-1], dtype=arr.dtype)
    return arr * (1 - onehot) + onehot * value[..., None]


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z); numpy, host-side only."""
    m = R
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                         (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    i = np.argmax(np.diag(m))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(m[i, i] - m[j, j] - m[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q
