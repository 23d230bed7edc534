"""Marching tetrahedra (C++ vs numpy oracle vs analytic), TSDF fusion."""

import numpy as np
import pytest

from vcr_gaus_tpu.meshing import marching as MC
from vcr_gaus_tpu.meshing import tsdf as T


def sphere_sdf(n=32, r=0.6):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (np.sqrt(x**2 + y**2 + z**2) - r).astype(np.float32), ax


def test_marching_tets_sphere_geometry():
    sdf, ax = sphere_sdf(40)
    sp = ax[1] - ax[0]
    verts, faces = MC.marching_tets(sdf, 0.0, origin=(-1, -1, -1),
                                    spacing=(sp, sp, sp))
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert radii.std() < 0.01
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # surface area ~ 4 pi r^2
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.36, rtol=0.05)


def test_cpp_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    sdf = rng.normal(size=(6, 7, 5)).astype(np.float32)
    sdf[0, 0, 0] = np.nan                      # unobserved cell skipped
    v1, f1 = MC.marching_tets(sdf, 0.1, origin=(1, 2, 3),
                              spacing=(0.5, 0.25, 1.0))
    v2, f2 = MC.marching_tets_numpy(sdf, 0.1, origin=(1, 2, 3),
                                    spacing=(0.5, 0.25, 1.0))
    # same triangle soup up to vertex dedup: compare sorted triangle centroids
    c1 = np.sort(v1[f1].mean(1), axis=0)
    c2 = np.sort(v2[f2].mean(1), axis=0)
    assert len(f1) == len(f2)
    np.testing.assert_allclose(c1, c2, atol=1e-4)
    # dedup actually happened
    assert len(v1) < len(v2)


def test_keep_largest_components():
    # two separated spheres; keep 1 component
    ax = np.linspace(-1, 1, 48)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    s1 = np.sqrt((x + 0.5) ** 2 + y**2 + z**2) - 0.3
    s2 = np.sqrt((x - 0.5) ** 2 + y**2 + z**2) - 0.15
    sdf = np.minimum(s1, s2).astype(np.float32)
    sp = ax[1] - ax[0]
    verts, faces = MC.marching_tets(sdf, 0.0, origin=(-1, -1, -1),
                                    spacing=(sp, sp, sp))
    v2, f2 = MC.keep_largest_components(verts, faces, n_keep=1)
    assert len(f2) < len(faces)
    assert np.all(v2[:, 0] < 0)               # only the big (left) sphere


def test_tsdf_sphere_fusion():
    """Fuse synthetic depth maps of a sphere from 6 axis-aligned cameras and
    recover its surface."""
    import jax.numpy as jnp

    from fixtures import ring_cameras
    from vcr_gaus_tpu.utils import graphics as G

    r = 0.5
    trans = np.zeros(3, np.float32)
    scale = np.ones(3, np.float32)
    grid = T.create_grid(trans, scale, voxel_size=0.05)
    w, h = 64, 64
    fovx = fovy = 0.8
    fx = G.fov2focal(fovx, w)
    intr = jnp.asarray([fx, G.fov2focal(fovy, h), w / 2, h / 2])

    for R_w2c, Tv in ring_cameras(n_cams=8, dist=3.0, h=0.0):
        # analytic sphere depth: ray from camera center
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = R_w2c
        view[:3, 3] = Tv
        viewm = jnp.asarray(view.T)
        K = np.asarray([[float(intr[0]), 0, w / 2],
                        [0, float(intr[1]), h / 2], [0, 0, 1]], np.float32)
        dirs = np.asarray(G.pixel_dirs(jnp.asarray(K), h, w))  # cam space
        c2w = np.linalg.inv(view)
        o = c2w[:3, 3]
        d_world = dirs @ c2w[:3, :3].T
        # |o + t d| = r
        b = 2 * (d_world @ o)
        c = o @ o - r * r
        disc = b * b - 4 * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0)
        depth = np.where(disc > 0, t * dirs[..., 2], 0).astype(np.float32)
        grid = T.integrate(grid, jnp.asarray(depth), viewm, intr)

    verts, faces = T.extract_mesh(grid, min_weight=1.0, n_clusters=1)
    assert len(verts) > 200
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.02)
    assert radii.std() < 0.03


def test_tsdf_contracted_sphere_fusion():
    """Same sphere recovery through the mip-360 contracted grid (unbounded
    path, tools/mesh_utils.py:168-276): integrate in contracted coords,
    extract, inverse-contract — the surface radius must survive the
    round-trip."""
    import jax.numpy as jnp

    from fixtures import ring_cameras
    from vcr_gaus_tpu.utils import graphics as G

    r = 0.5
    # cameras at dist 3 -> bounding-sphere radius ~3.3 normalizes the world
    grid = T.create_contracted_grid(center=np.zeros(3), radius=1.2,
                                    resolution=96)
    w, h = 64, 64
    fovx = fovy = 0.8
    fx = G.fov2focal(fovx, w)
    intr = jnp.asarray([fx, G.fov2focal(fovy, h), w / 2, h / 2])

    for R_w2c, Tv in ring_cameras(n_cams=8, dist=3.0, h=0.0):
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = R_w2c
        view[:3, 3] = Tv
        K = np.asarray([[float(intr[0]), 0, w / 2],
                        [0, float(intr[1]), h / 2], [0, 0, 1]], np.float32)
        dirs = np.asarray(G.pixel_dirs(jnp.asarray(K), h, w))
        c2w = np.linalg.inv(view)
        o = c2w[:3, 3]
        d_world = dirs @ c2w[:3, :3].T
        b = 2 * (d_world @ o)
        c = o @ o - r * r
        disc = b * b - 4 * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0)
        depth = np.where(disc > 0, t * dirs[..., 2], 0).astype(np.float32)
        grid = T.integrate(grid, jnp.asarray(depth), jnp.asarray(view.T),
                           intr, contracted=True)

    verts, faces = T.extract_mesh(grid, min_weight=1.0, n_clusters=1)
    assert len(verts) > 200
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.05)
    assert radii.std() < 0.05
    # contraction round-trip sanity at the API level
    y = np.asarray(T.contract(jnp.asarray([[3.0, 0, 0]])))
    assert np.linalg.norm(y) < 2.0
    back = np.asarray(T.inv_contract(jnp.asarray(y)))
    np.testing.assert_allclose(back, [[3.0, 0, 0]], atol=1e-4)
