"""Fly-through render paths + video export (tools/render_utils.py).

Pose PCA normalization (:74-105), elliptical camera paths (:108-174) and
video writing (:183-247) for turntable/NVS videos.
"""

from __future__ import annotations

import os

import numpy as np

from ..data.cameras import Camera


def poses_c2w(cameras: list[Camera]) -> np.ndarray:
    """(N, 4, 4) camera-to-world matrices."""
    out = []
    for c in cameras:
        w2c = c.world_view_transform.T           # column convention
        out.append(np.linalg.inv(w2c))
    return np.stack(out)


def transform_poses_pca(poses: np.ndarray):
    """Align the principal axes of the camera positions with the world axes
    and rescale into [-1, 1] (tools/render_utils.py:74-105). Returns
    (transformed poses, the 4x4 transform applied)."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    centered = t - t_mean
    eigval, eigvec = np.linalg.eig(centered.T @ centered)
    inds = np.argsort(eigval)[::-1]
    rot = eigvec[:, inds].T.real
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_rec = unpad_poses(transform @ pad_poses(poses))
    # flip so average up is +y... reference flips z-up consistency
    if poses_rec.mean(axis=0)[2, 1] < 0:
        flip = np.diag(np.array([1, -1, -1]))
        poses_rec = unpad_poses(
            np.diag(np.array([1, -1, -1, 1])) @ pad_poses(poses_rec))
        transform = np.diag(np.array([1, -1, -1, 1])) @ np.concatenate(
            [transform, np.array([[0, 0, 0, 1.0]])], 0)
    else:
        transform = np.concatenate([transform,
                                    np.array([[0, 0, 0, 1.0]])], 0)
    scale = 1.0 / np.max(np.abs(poses_rec[:, :3, 3]))
    poses_rec[:, :3, 3] *= scale
    transform = np.diag(np.array([scale] * 3 + [1.0])) @ transform
    return poses_rec, transform


def pad_poses(p):
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def generate_ellipse_path(poses: np.ndarray, n_frames: int = 120,
                          z_variation: float = 0.0, z_phase: float = 0.0):
    """Elliptical path around the scene at the cameras' height distribution
    (tools/render_utils.py:108-150). poses: (N,3,4) PCA-normalized.
    Returns (n_frames, 3, 4) c2w poses looking at the center."""
    center = np.percentile(poses[:, :3, 3], 50, axis=0) * np.array([1, 1, 0])
    offset = center + np.array([0, 0, poses[:, 2, 3].mean()])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)

    theta = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    positions = np.stack([
        center[0] + sc[0] * np.cos(theta),
        center[1] + sc[1] * np.sin(theta),
        offset[2] + z_variation * sc[2] * np.sin(theta + 2 * np.pi * z_phase),
    ], axis=-1)

    out = []
    up = np.array([0.0, 0.0, 1.0])
    for pos in positions:
        fwd = center + np.array([0, 0, offset[2]]) - pos
        fwd = fwd / max(np.linalg.norm(fwd), 1e-9)
        right = np.cross(fwd, up)
        right /= max(np.linalg.norm(right), 1e-9)
        u = np.cross(right, fwd)
        c2w = np.eye(4)[:3]
        c2w[:, 0] = right
        c2w[:, 1] = -u
        c2w[:, 2] = fwd
        c2w[:, 3] = pos
        out.append(c2w)
    return np.stack(out)


def path_to_cameras(path_c2w: np.ndarray, inv_transform: np.ndarray,
                    template: Camera) -> list[Camera]:
    """Map path poses back to the original world and wrap as Cameras."""
    import dataclasses
    cams = []
    for i, c2w34 in enumerate(path_c2w):
        c2w = np.concatenate([c2w34, np.array([[0, 0, 0, 1.0]])], 0)
        c2w = inv_transform @ c2w
        # inv_transform carries the PCA 1/scale — re-orthonormalize
        R = c2w[:3, :3]
        R = R / np.linalg.norm(R, axis=0, keepdims=True)
        c2w[:3, :3] = R
        w2c = np.linalg.inv(c2w)
        cams.append(dataclasses.replace(
            template, colmap_id=i, idx=i, image_name=f"path_{i:04d}",
            R=w2c[:3, :3].T, T=w2c[:3, 3], image=None))
    return cams


def write_video(path: str, frames: list[np.ndarray], fps: int = 30) -> str:
    """(H,W,3) uint8 frames -> mp4 (tools/render_utils.py:183-247). Falls
    back to an animated GIF when no ffmpeg backend is installed (the image
    ships imageio without imageio-ffmpeg), then to a PNG frame directory.
    Returns the path actually written."""
    import imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(f)
        return path
    except Exception:
        pass
    gif = os.path.splitext(path)[0] + ".gif"
    try:
        imageio.mimsave(gif, frames, duration=1.0 / fps, loop=0)
        return gif
    except Exception:
        from PIL import Image
        frame_dir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(frame_dir, f"{i:05d}.png"))
        return frame_dir


def render_flythrough(state, cameras: list[Camera], rcfg, out_path: str,
                      n_frames: int = 120, sh_degree: int = 3,
                      scene_extent: float = 1e9, fps: int = 30):
    """Train cameras -> PCA-normalized ellipse path -> rendered video."""
    import jax.numpy as jnp

    from ..render.renderer import render
    poses = pad_poses(poses_c2w(cameras)[:, :3, :4])
    poses_rec, transform = transform_poses_pca(poses)
    path = generate_ellipse_path(poses_rec, n_frames)
    cams = path_to_cameras(path, np.linalg.inv(transform), cameras[0])
    frames = []
    for cam in cams:
        out = render(state, cam.arrays(), rcfg, jnp.zeros(3), sh_degree,
                     scene_extent=scene_extent)
        frames.append((np.clip(np.asarray(out["render"]), 0, 1)
                       .transpose(1, 2, 0) * 255).astype(np.uint8))
    return write_video(out_path, frames, fps)
