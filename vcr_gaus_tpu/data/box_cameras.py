"""Synthetic bounding-box camera sampling for visibility-gated densification.

Equivalent of tools/camera_utils.py:124-481 (find_axis/look_at/bb_camera/
around_grid_posi/up_grid_posi) + trainer.sample_cameras (trainer.py:621-634):
cameras placed on the faces of the normalized scene box (top face + 4 side
faces), looking at a target below the top, rendered only through the
per-Gaussian stats kernel to decide which gaussians are visible from outside
the scene volume.
"""

from __future__ import annotations

import math

import numpy as np

from ..utils import graphics as G
from .cameras import CameraArrays


def find_axis(R: np.ndarray, axis_name: str = "up"):
    """Which box axis corresponds to a world direction (COLMAP frame: y
    down), and its sign (tools/camera_utils.py:124-142)."""
    axis_w = {"up": [0, -1, 0], "front": [0, 0, 1], "right": [1, 0, 0]}[
        axis_name]
    axis_c = R @ np.asarray(axis_w, np.float64)
    axis = int(np.argmax(np.abs(axis_c)))
    return axis, float(np.sign(axis_c[axis]) or 1.0)


def look_at_w2c(campos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """COLMAP-convention look-at: camera forward = +z toward target
    (tools/camera_utils.py:163-178, opengl=False branch)."""
    fwd = target - campos
    fwd = fwd / max(np.linalg.norm(fwd), 1e-12)
    up = np.array([0.0, 1.0, 0.0])
    if abs(fwd @ up) > 0.999:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-12)
    up = np.cross(right, fwd)
    R = np.stack([right, up, fwd])                 # rows: w2c rotation
    return R


def _face_positions(n: int, up_axis: int, up_sign: float, up: bool,
                    around: bool, sample_mode: str, rng,
                    boundary: float = 0.9) -> np.ndarray:
    """Positions in normalized box coords [-1,1]^3 on the top face and/or
    the four side faces."""
    side_axes = [a for a in range(3) if a != up_axis]
    pts = []
    n_up = n // 3 if (up and around) else (n if up else 0)
    n_around = n - n_up if around else 0
    if up and n_up > 0:
        if sample_mode == "random":
            q = rng.uniform(-1, 1, (n_up, 3))
        else:
            k = max(int(math.sqrt(n_up)), 1)
            g = np.linspace(-1, 1, k)
            gx, gy = np.meshgrid(g, g, indexing="xy")
            q = np.zeros((k * k, 3))
            q[:, side_axes[0]] = gx.ravel()
            q[:, side_axes[1]] = gy.ravel()
        q[:, up_axis] = up_sign
        pts.append(q)
    if around and n_around > 0:
        per_face = max(n_around // 4, 1)
        for face_axis, sign in ((side_axes[0], 1), (side_axes[0], -1),
                                (side_axes[1], 1), (side_axes[1], -1)):
            other = [a for a in range(3) if a != face_axis and a != up_axis]
            if sample_mode == "random":
                q = rng.uniform(-1, 1, (per_face, 3))
            else:
                k = max(int(math.sqrt(per_face)), 1)
                g = np.linspace(-1, 1, k)
                gx, gy = np.meshgrid(g, g, indexing="xy")
                q = np.zeros((k * k, 3))
                q[:, other[0]] = gx.ravel()
                q[:, up_axis] = gy.ravel()
            q[:, face_axis] = sign
            # pull side cameras toward the top (boundary shrink, :461)
            q[:, up_axis] = q[:, up_axis] * boundary + (1 - boundary) * up_sign
            pts.append(q)
    return np.concatenate(pts, 0) if pts else np.zeros((0, 3))


def sample_box_cameras(
    n: int, trans, scale, up: bool = True, around: bool = True,
    sample_mode: str = "grid", fov: float = 2.5, size: int = 512,
    seed: int = 0,
) -> list[CameraArrays]:
    """Sample ~n cameras on the box surface looking into the scene.

    The reference uses FoV 2.5 rad at 1500^2 px (trainer.py:625-626); the
    resolution is configurable here because the consumer is a binary
    visibility count, which saturates well below 1500^2."""
    trans = np.asarray(trans, np.float64)
    scale = np.broadcast_to(np.asarray(scale, np.float64), (3,)).copy()
    rng = np.random.default_rng(seed)
    R_box = trans[:3, :3] if trans.ndim == 2 else np.eye(3)
    up_axis, up_sign = find_axis(R_box, "up")

    q = _face_positions(n, up_axis, up_sign, up, around, sample_mode, rng)
    # target: center, one unit below the top in box coords (:430-434)
    tgt_box = np.zeros(3)
    tgt_box[up_axis] = -up_sign

    def to_world(p):
        if trans.ndim == 2:
            return (p * scale - trans[:3, 3]) @ trans[:3, :3]
        return p * scale + trans

    cams = []
    target_w = to_world(tgt_box)
    proj = G.projection_matrix(0.01, 100.0, fov, fov).T
    tanf = math.tan(fov / 2)
    f = size / (2 * tanf)
    intr = np.array([f, f, size / 2, size / 2], np.float32)
    zeros_img = np.zeros((3, size, size), np.float32)
    for p in q:
        pos = to_world(p)
        R = look_at_w2c(pos, target_w)
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = R
        view[:3, 3] = -R @ pos
        viewm = view.T                              # row-vector convention
        cams.append(CameraArrays(
            viewmatrix=viewm.astype(np.float32),
            projmatrix=(viewm @ proj).astype(np.float32),
            cam_center=pos.astype(np.float32),
            intr=intr,
            tanfov=np.array([tanf, tanf], np.float32),
            image=zeros_img, normal=zeros_img,
            depth=np.zeros((size, size), np.float32),
            mask=np.zeros((size, size), np.int32),
            has_normal=np.asarray(False), has_depth=np.asarray(False),
            has_mask=np.asarray(False), idx=np.asarray(0, np.int32)))
    return cams
