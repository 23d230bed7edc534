"""TSDF fusion of rendered depth maps into a dense voxel grid, jitted JAX.

TPU-native replacement for Open3D's VoxelBlockGrid integration
(tools/depth2mesh.py:22-100) and the CPU ScalableTSDFVolume path
(tools/mesh_utils.py:124-166). Scenes are box-normalized via meta.json, so a
dense grid over the (optionally oriented) box fits HBM at the benchmark voxel
sizes (SURVEY.md §7.3#5); integration is one fused gather/where per view.

Depth masking before integration matches the reference
(tools/depth2mesh.py:45-58): zero where alpha < thr, outside the box, or
semantic background.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFGrid(NamedTuple):
    tsdf: jnp.ndarray       # (X,Y,Z) f32 in [-1,1] (truncated, normalized)
    weight: jnp.ndarray     # (X,Y,Z) f32
    origin: np.ndarray      # (3,) world coords of voxel (0,0,0) — box space
    spacing: np.ndarray     # (3,)
    trans: np.ndarray       # meta.json box transform ((3,) or (4,4))
    scale: np.ndarray       # box scale
    contracted: bool = False  # grid lives in mip-360 contracted coords


def contract(x, eps=1e-9):
    """mip-NeRF 360 scene contraction: identity inside the unit ball,
    (2 - 1/|x|) x/|x| outside — maps R^3 into the radius-2 ball
    (tools/mesh_utils.py:176-183 equivalent)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe = jnp.maximum(norm, eps)
    return jnp.where(norm <= 1.0, x, (2.0 - 1.0 / safe) * (x / safe))


def inv_contract(y, eps=1e-9):
    """Inverse contraction: y in the radius-2 ball -> world
    (tools/mcube_utils.py inverse-contraction path)."""
    norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    safe = jnp.maximum(norm, eps)
    return jnp.where(norm <= 1.0, y,
                     (y / safe) / jnp.maximum(2.0 - safe, eps))


def create_grid(trans, scale, voxel_size: float,
                bound: float = 1.0) -> TSDFGrid:
    """Dense grid covering the normalized box [-bound, bound]^3, with voxel
    size given in *world* units (matching the reference's voxel_size knob)."""
    trans = np.asarray(trans, np.float32)
    scale = np.broadcast_to(np.asarray(scale, np.float32), (3,))
    world_extent = 2.0 * bound * scale            # per-axis box size (world)
    dims = np.maximum((world_extent / voxel_size).astype(int) + 1, 2)
    spacing = world_extent / (dims - 1)           # world-unit spacing
    origin = -bound * scale                       # in box (unnormalized) space
    return TSDFGrid(
        tsdf=jnp.ones(tuple(dims), jnp.float32),
        weight=jnp.zeros(tuple(dims), jnp.float32),
        origin=origin.astype(np.float32), spacing=spacing.astype(np.float32),
        trans=trans, scale=scale)


def create_contracted_grid(center, radius, resolution: int = 320) -> TSDFGrid:
    """Dense grid over the contracted ball [-2, 2]^3 for unbounded scenes
    (the reference's extract_mesh_unbounded, tools/mesh_utils.py:168-276).
    ``center``/``radius`` normalize the world so the cameras' region maps
    into the unit ball before contraction."""
    dims = (resolution,) * 3
    spacing = np.full(3, 4.0 / (resolution - 1), np.float32)
    origin = np.full(3, -2.0, np.float32)
    return TSDFGrid(
        tsdf=jnp.ones(dims, jnp.float32),
        weight=jnp.zeros(dims, jnp.float32),
        origin=origin, spacing=spacing,
        trans=np.asarray(center, np.float32),
        scale=np.asarray(radius, np.float32), contracted=True)


def _voxel_world_coords(grid: TSDFGrid, contracted: bool = False):
    """World coordinates of all voxel centers, (X,Y,Z,3). ``contracted``
    must be a static Python bool (the grid flag is a traced leaf under jit)."""
    dims = grid.tsdf.shape
    axes = [grid.origin[a] + grid.spacing[a] * jnp.arange(dims[a])
            for a in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    pts_box = jnp.stack([gx, gy, gz], axis=-1)
    trans = jnp.asarray(grid.trans)
    if contracted:
        # contracted coords -> normalized world -> world
        world_n = inv_contract(pts_box.reshape(-1, 3))
        world = world_n * jnp.asarray(grid.scale) + trans
        return world.reshape(pts_box.shape)
    if trans.ndim == 2:
        # box space -> world: inverse of normalize (x_box = R x + t)
        from ..utils.math import mm
        flat = pts_box.reshape(-1, 3)
        world = mm(flat - trans[:3, 3], trans[:3, :3])
        return world.reshape(pts_box.shape)
    return pts_box + trans


@functools.partial(jax.jit, static_argnames=("sdf_trunc_vox", "contracted"))
def integrate(grid: TSDFGrid, depth: jnp.ndarray, viewmatrix: jnp.ndarray,
              intr: jnp.ndarray, sdf_trunc_vox: int = 4,
              contracted: bool = False) -> TSDFGrid:
    """Integrate one masked depth map (H,W); invalid pixels are <= 0.

    Projective TSDF with running weighted average (the standard KinectFusion
    update Open3D implements). Pass contracted=True for grids from
    create_contracted_grid (the flag must be static under jit)."""
    h, w = depth.shape
    pts = _voxel_world_coords(grid, contracted)   # (X,Y,Z,3)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    cam = hom.reshape(-1, 4) @ viewmatrix         # row-vector w2c
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    u = intr[0] * x / z + intr[2]
    v = intr[1] * y / z + intr[3]
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
    d = depth[vi, ui]
    valid = ((z > 1e-4) & (u >= 0) & (u < w) & (v >= 0) & (v < h) & (d > 0))

    trunc = float(sdf_trunc_vox) * jnp.min(jnp.asarray(grid.spacing))
    if contracted:
        # world-space voxel size grows with the contraction Jacobian
        # 1/(2-|y|)^2 outside the unit ball; truncation follows it
        dims = grid.tsdf.shape
        axes = [grid.origin[a] + grid.spacing[a] * jnp.arange(dims[a])
                for a in range(3)]
        gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
        ynorm = jnp.sqrt(gx * gx + gy * gy + gz * gz).reshape(-1)
        jac = jnp.where(ynorm <= 1.0, 1.0,
                        1.0 / jnp.maximum(2.0 - ynorm, 0.05) ** 2)
        trunc = trunc * jac * jnp.asarray(grid.scale)
    sdf = (d - z) / trunc
    valid = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)

    w_old = grid.weight.reshape(-1)
    t_old = grid.tsdf.reshape(-1)
    w_new = w_old + valid.astype(jnp.float32)
    t_new = jnp.where(valid, (t_old * w_old + sdf) / jnp.maximum(w_new, 1.0),
                      t_old)
    return grid._replace(tsdf=t_new.reshape(grid.tsdf.shape),
                         weight=w_new.reshape(grid.weight.shape))


def extract_mesh(grid: TSDFGrid, min_weight: float = 1.0,
                 n_clusters: int = 1):
    """Marching tetrahedra over the fused grid (unobserved voxels -> NaN),
    vertices mapped back to world space; largest-component cleanup."""
    from .marching import keep_largest_components, marching_tets

    tsdf = np.asarray(grid.tsdf)
    weight = np.asarray(grid.weight)
    sdf = np.where(weight >= min_weight, tsdf, np.nan).astype(np.float32)
    verts, faces = marching_tets(sdf, 0.0, origin=grid.origin,
                                 spacing=grid.spacing)
    trans = np.asarray(grid.trans)
    if grid.contracted:
        import jax.numpy as jnp
        verts = np.asarray(inv_contract(jnp.asarray(verts))) * np.asarray(
            grid.scale) + trans
    elif trans.ndim == 2:
        verts = (verts - trans[:3, 3]) @ trans[:3, :3]
    else:
        verts = verts + trans
    if n_clusters > 0 and len(faces):
        verts, faces = keep_largest_components(verts, faces, n_clusters)
    return verts, faces


def mask_depth(depth, alpha, alpha_thr: float, world_pts=None,
               inside_mask=None, sem_fg=None):
    """Pre-integration depth masking (tools/depth2mesh.py:45-58)."""
    d = jnp.where(alpha > alpha_thr, depth, 0.0)
    if inside_mask is not None:
        d = jnp.where(inside_mask, d, 0.0)
    if sem_fg is not None:
        d = jnp.where(sem_fg, d, 0.0)
    return d
