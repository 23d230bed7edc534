import numpy as np

from vcr_gaus_tpu.utils.ply import (read_ply, read_points_ply, write_ply,
                                    write_points_ply)


def test_ply_roundtrip_vertex(tmp_path):
    rng = np.random.default_rng(0)
    props = {k: rng.normal(size=100).astype(np.float32)
             for k in ["x", "y", "z", "opacity", "scale_0"]}
    p = tmp_path / "a.ply"
    write_ply(str(p), props)
    back = read_ply(str(p))
    for k, v in props.items():
        np.testing.assert_array_equal(back[k], v)


def test_points_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)
    p = tmp_path / "pts.ply"
    write_points_ply(str(p), xyz, rgb)
    pts, colors, normals = read_points_ply(str(p))
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(colors * 255, rgb, atol=0.5)
    np.testing.assert_array_equal(normals, 0)


def test_mesh_faces_roundtrip(tmp_path):
    xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = tmp_path / "mesh.ply"
    write_ply(str(p), {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]},
              faces=faces)
    back = read_ply(str(p))
    np.testing.assert_array_equal(back["__faces__"], faces)


def test_empty_mesh_roundtrip(tmp_path):
    """A zero-vertex / zero-face mesh PLY must read back as empty arrays
    (a fully-pruned degenerate model writes one; eval tooling loads it)."""
    p = tmp_path / "empty.ply"
    write_ply(str(p), {"x": np.zeros(0, np.float32),
                       "y": np.zeros(0, np.float32),
                       "z": np.zeros(0, np.float32)},
              faces=np.zeros((0, 3), np.int32))
    back = read_ply(str(p))
    assert back["x"].shape == (0,)
    assert back["__faces__"].shape == (0, 3)


def test_ascii_ply(tmp_path):
    txt = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1 2\n3 4 5\n"
    )
    p = tmp_path / "a.ply"
    p.write_text(txt)
    d = read_ply(str(p))
    np.testing.assert_allclose(d["x"], [0, 3])
    np.testing.assert_allclose(d["z"], [2, 5])


def test_splat_export_format(tmp_path):
    """antimatter15 .splat: 32 bytes/gaussian, importance-descending order,
    decodable positions/scales/rgba/quat."""
    import numpy as np

    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.models.ply_io import save_splat

    rng = np.random.default_rng(1)
    n = 7
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = GM.create_from_pcd(pts, cols, 16, sh_degree=3)
    path = str(tmp_path / "pcd.splat")
    save_splat(st, path)
    raw = np.fromfile(path, np.uint8).reshape(n, 32)
    xyz = raw[:, 0:12].copy().view(np.float32).reshape(n, 3)
    scale = raw[:, 12:24].copy().view(np.float32).reshape(n, 3)
    # every stored position is one of the inputs (order is by importance)
    for row in xyz:
        assert np.min(np.linalg.norm(pts - row, axis=1)) < 1e-6
    assert (scale > 0).all()
    opacity = raw[:, 27].astype(np.float32) / 255.0
    imp = scale.prod(axis=1) * opacity
    assert np.all(np.diff(imp) <= 1e-6), "not importance-sorted"
    q = (raw[:, 28:32].astype(np.float32) - 128.0) / 128.0
    assert np.abs(np.linalg.norm(q, axis=1) - 1.0).max() < 0.05


def test_gaussian_ply_header_is_reference_golden(tmp_path):
    """The vertex property ORDER must match the reference bit-layout
    (scene/gaussian_model.py:272-287 construct_list_of_attributes) so
    checkpoints interchange with the CUDA implementation byte-for-byte."""
    import numpy as np

    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.models.ply_io import save_gaussian_ply

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (5, 3)).astype(np.float32)
    for sh_degree, ch_sem in ((3, 0), (2, 4)):
        st = GM.create_from_pcd(pts, cols, 8, sh_degree=sh_degree,
                                ch_sem=ch_sem)
        path = str(tmp_path / f"g{sh_degree}_{ch_sem}.ply")
        save_gaussian_ply(st, path)
        props = []
        with open(path, "rb") as f:
            for line in f:
                if line.strip() == b"end_header":
                    break
                if line.startswith(b"property"):
                    parts = line.decode().split()
                    assert parts[1] == "float"
                    props.append(parts[2])
        k_rest = 3 * ((sh_degree + 1) ** 2 - 1)
        golden = (["x", "y", "z", "nx", "ny", "nz"]
                  + [f"f_dc_{i}" for i in range(3)]
                  + [f"f_rest_{i}" for i in range(k_rest)]
                  + ["opacity"]
                  + [f"scale_{i}" for i in range(3)]
                  + [f"rot_{i}" for i in range(4)]
                  + [f"obj_dc_{i}" for i in range(ch_sem)])
        assert props == golden, (props, golden)


def test_save_empty_model_roundtrips(tmp_path):
    """A zero-active model must serialize (reshape(n, -1) cannot infer the
    flat width at n == 0): after a degenerate prune the trainer still saves
    and the file reads back with 0 vertices instead of crashing mid-run."""
    import jax.numpy as jnp
    import numpy as np

    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.models.ply_io import save_gaussian_ply, save_inside_ply
    from vcr_gaus_tpu.utils.ply import read_ply

    rng = np.random.default_rng(0)
    st = GM.create_from_pcd(rng.random((20, 3), np.float32),
                            rng.random((20, 3), np.float32), 64, 3)
    st = st._replace(active=jnp.zeros((64,), bool))
    p1 = str(tmp_path / "empty.ply")
    p2 = str(tmp_path / "empty_inside.ply")
    save_gaussian_ply(st, p1)
    save_inside_ply(st, p2, np.ones(64, bool))
    assert len(read_ply(p1)["x"]) == 0
    assert len(read_ply(p2)["x"]) == 0
