"""Contracted TSDF, render paths, viewer bridge protocol."""

import json
import socket
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from vcr_gaus_tpu.meshing import tsdf as T


def test_contraction_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(500, 3)) * 3.0)
    y = T.contract(x)
    assert float(jnp.linalg.norm(y, axis=-1).max()) < 2.0
    back = T.inv_contract(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_contracted_tsdf_sphere():
    """Fuse analytic sphere depth into a contracted grid; surface recovered
    through the contraction."""
    from fixtures import ring_cameras
    from vcr_gaus_tpu.utils import graphics as G

    r = 0.5
    # the scene sits at |x|/radius = 0.125 of the normalized ball, so the
    # contracted grid must be fine enough there (world step = 4*spacing)
    grid = T.create_contracted_grid(np.zeros(3), radius=4.0, resolution=160)
    w = h = 48
    fov = 0.8
    f = w / (2 * np.tan(fov / 2))
    intr = jnp.asarray([f, f, w / 2, h / 2])
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    for R_w2c, Tv in ring_cameras(n_cams=8, dist=3.0, h=0.0):
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = R_w2c
        view[:3, 3] = Tv
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
                           intr, sdf_trunc_vox=2, contracted=True)
    verts, faces = T.extract_mesh(grid, min_weight=1.0, n_clusters=1)
    assert len(verts) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.08)


def test_ellipse_path_orbits_scene():
    from vcr_gaus_tpu.utils import render_paths as RP
    from fixtures import ring_cameras
    from vcr_gaus_tpu.data.cameras import Camera
    cams = []
    for i, (R, Tv) in enumerate(ring_cameras(n_cams=10, dist=3.0, h=0.5)):
        cams.append(Camera(colmap_id=i, idx=i, image_name=f"c{i}",
                           R=R.T, T=Tv, fovx=0.8, fovy=0.6,
                           width=32, height=24))
    poses = RP.poses_c2w(cams)[:, :3, :4]
    poses_rec, transform = RP.transform_poses_pca(poses)
    assert np.abs(poses_rec[:, :3, 3]).max() <= 1.0 + 1e-5
    path = RP.generate_ellipse_path(poses_rec, n_frames=24)
    assert path.shape == (24, 3, 4)
    # path cameras form a loop with finite extent
    assert np.isfinite(path).all()
    new_cams = RP.path_to_cameras(path, np.linalg.inv(transform), cams[0])
    assert len(new_cams) == 24
    # rotation part orthonormal
    for c in new_cams[:3]:
        np.testing.assert_allclose(c.R @ c.R.T, np.eye(3), atol=1e-5)


def test_network_gui_roundtrip():
    from vcr_gaus_tpu.render.network_gui import NetworkGUI
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        view = np.eye(4).reshape(-1).tolist()
        msg = json.dumps({
            "resolution_x": 16, "resolution_y": 8, "train": True,
            "fov_y": 0.6, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": view, "view_projection_matrix": view,
        }).encode()
        s.sendall(len(msg).to_bytes(4, "little"))
        s.sendall(msg)
        # read image bytes + verify
        n = 16 * 8 * 3
        buf = b""
        while len(buf) < n:
            buf += s.recv(n - len(buf))
        vlen = int.from_bytes(s.recv(4), "little")
        results["verify"] = s.recv(vlen).decode()
        results["img_bytes"] = len(buf)
        s.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    req = None
    import time
    for _ in range(200):
        req = gui.poll()
        if req is not None:
            break
        time.sleep(0.05)
    assert req is not None and req.camera is not None
    assert req.camera.intr.shape == (4,)
    assert req.do_training
    gui.send_image(np.zeros((3, 8, 16), np.float32), "ok")
    t.join(timeout=5)
    assert results["verify"] == "ok"
    assert results["img_bytes"] == 16 * 8 * 3


def test_orbit_camera():
    import numpy as np
    from vcr_gaus_tpu.render.orbit import OrbitCamera
    cam = OrbitCamera(640, 480, radius=3.0)
    np.testing.assert_allclose(cam.campos, [0, 0, 3], atol=1e-6)
    # view @ pose = identity
    np.testing.assert_allclose(cam.view @ cam.pose, np.eye(4), atol=1e-6)
    cam.orbit(100.0, 30.0)
    R = cam.rot
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)   # still SO(3)
    assert abs(np.linalg.norm(cam.campos) - 3.0) < 1e-5         # on the orbit
    cam.scale(2)
    assert abs(np.linalg.norm(cam.campos) - 3.0 / 1.1 ** 2) < 1e-5
    before = cam.center.copy()
    cam.pan(10, -5)
    assert np.linalg.norm(cam.center - before) > 0
    assert cam.fovx > cam.fovy                                   # 4:3 aspect
    assert cam.intrinsics[0] == cam.intrinsics[1] > 0
    assert cam.mvp.shape == (4, 4)


def test_compile_cache_writes_entries(tmp_path):
    """enable_compilation_cache points jax at a persistent dir and compiled
    executables land there (so re-runs of the on-chip scripts skip the
    multi-minute remote compile)."""
    import jax
    import jax.numpy as jnp

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = str(tmp_path / "xla")
    assert enable_compilation_cache(cache_dir) == cache_dir
    try:
        # the helper's 1 s threshold skips trivial compiles; drop it so this
        # tiny program is cached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        f = jax.jit(lambda x: (jnp.sin(x) @ jnp.cos(x).T).sum())
        _ = float(f(jnp.ones((64, 64))))
        entries = [p for p in (tmp_path / "xla").rglob("*") if p.is_file()]
        assert entries, "no compilation-cache entries were written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_compile_cache_opt_out(tmp_path, monkeypatch):
    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    monkeypatch.setenv("VCR_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "xla")) is None
    assert not (tmp_path / "xla").exists()
