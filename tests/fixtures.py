"""Synthetic COLMAP scene fixture: a colored gaussian-blob cube observed by a
ring of cameras, images rendered with the pure-JAX oracle compositor. Used by
the scene-reader, trainer-smoke and meshing tests (the 'synthetic 8-camera
cube scene' of SURVEY.md §4)."""

from __future__ import annotations

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_subprocess_env(*extra_paths):
    """Env for CLI subprocess tests that MUST run on local CPU.

    Strips any PYTHONPATH entry that loads the TPU plugin's sitecustomize
    (e.g. /root/.axon_site) — once that plugin registers, JAX_PLATFORMS=cpu
    is silently ignored and the subprocess dispatches to the tunneled chip,
    which is slow, serialized, and flaky under xdist."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    keep = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *extra_paths, *keep])
    return env


def make_cube_points(n=600, seed=0):
    """Points on the surface of a unit cube, colored by face."""
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    for i in range(n):
        a = axis[i]
        others = [j for j in range(3) if j != a]
        pts[i, a] = sign[i]
        pts[i, others[0]] = uv[i, 0]
        pts[i, others[1]] = uv[i, 1]
    colors = np.zeros((n, 3))
    colors[np.arange(n), axis] = 0.5 + 0.5 * (sign > 0)
    colors += 0.15
    return pts.astype(np.float32), np.clip(colors, 0, 1).astype(np.float32)


def ring_cameras(n_cams=8, dist=4.0, h=0.8):
    """(R_c2w_transposed, T) w2c pairs looking at the origin."""
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        pos = np.array([dist * np.cos(ang), h, dist * np.sin(ang)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])     # COLMAP convention: y down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_w2c = np.stack([right, up2, fwd])     # rows
        T = -R_w2c @ pos
        cams.append((R_w2c, T))
    return cams


def render_oracle_image(pts, colors, R_w2c, T, width, height, fovx, fovy,
                        scale=0.06):
    """Ground-truth photo via the pure-JAX oracle compositor."""
    import jax.numpy as jnp

    from vcr_gaus_tpu.ops import projection as PF
    from vcr_gaus_tpu.ops import rasterize_ref as REF
    from vcr_gaus_tpu.utils import graphics as G

    n = len(pts)
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = R_w2c
    view[:3, 3] = T
    viewm = view.T                                 # row-vector convention
    projm = viewm @ G.projection_matrix(0.01, 100.0, fovx, fovy).T

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1
    proj = PF.project_gaussians(
        jnp.asarray(pts), jnp.full((n, 3), scale), jnp.asarray(quats),
        jnp.asarray(viewm), jnp.asarray(projm),
        np.tan(fovx / 2), np.tan(fovy / 2), width, height)
    feats = PF.pack_features(proj, jnp.full((n,), 0.9),
                             jnp.asarray(colors), None, None, 0)
    order = REF.depth_order(proj.depth_z, proj.radius)
    img = REF.composite_reference(feats, order, height, width,
                                  jnp.zeros(3), 0)
    return np.asarray(img[:3])


def write_colmap_scene(root, n_cams=8, n_pts=600, width=64, height=48,
                       with_priors=False):
    """Write a complete COLMAP-layout scene under ``root``."""
    from PIL import Image

    from vcr_gaus_tpu.utils import colmap as CM
    from vcr_gaus_tpu.utils import graphics as G

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    pts, colors = make_cube_points(n_pts)
    fovx, fovy = 0.9, 0.7
    fx = G.fov2focal(fovx, width)
    fy = G.fov2focal(fovy, height)

    cams = {1: CM.ColmapCamera(1, "PINHOLE", width, height,
                               np.array([fx, fy, width / 2, height / 2]))}
    CM.write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))

    from vcr_gaus_tpu.utils.math import rotmat_to_quat
    images = {}
    for i, (R_w2c, T) in enumerate(ring_cameras(n_cams)):
        name = f"img_{i:03d}.png"
        img = render_oracle_image(pts, colors, R_w2c, T, width, height,
                                  fovx, fovy)
        Image.fromarray((np.clip(img, 0, 1).transpose(1, 2, 0) * 255
                         ).astype(np.uint8)).save(
            os.path.join(root, "images", name))
        images[i + 1] = CM.ColmapImage(i + 1, rotmat_to_quat(R_w2c),
                                       T, 1, name)
        if with_priors:
            os.makedirs(os.path.join(root, "normals"), exist_ok=True)
            os.makedirs(os.path.join(root, "masks"), exist_ok=True)
            nrm = np.zeros((3, height, width), np.float32)
            nrm[2] = -1.0
            np.savez(os.path.join(root, "normals", f"img_{i:03d}.npz"),
                     nrm)
            Image.fromarray(np.ones((height, width), np.uint8)).save(
                os.path.join(root, "masks", name))
    CM.write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))
    CM.write_points3d_binary(pts, (colors * 255), os.path.join(
        root, "sparse/0/points3D.bin"))
    return pts, colors
