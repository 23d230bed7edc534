"""Preprocessing tools: TNT SfM-log conversion and prior extraction
(reference process_data/convert_tnt_to_json.py, extract_normal.py,
extract_mask.py). The colmap-binary stages are external; everything here
tests the pure-numpy plumbing around them."""

import json
import os
import sqlite3
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))

import convert_tnt as CT
from fixtures import cpu_subprocess_env


def _random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3)
    return T


def test_sfm_log_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(4)]
    poses = {i: _random_pose(rng) for i in range(4)}
    lines = []
    for i in range(4):
        lines.append(f"{i} {i} 0\n")       # header: idx valid ?
        for r in range(4):
            lines.append(" ".join(str(v) for v in poses[i][r]) + "\n")
    # one invalid block
    lines.append("4 -1 0\n")
    for r in range(4):
        lines.append("0 0 0 1\n")
    log = tmp_path / "Scene_COLMAP_SfM.log"
    log.write_text("".join(lines))

    w2c = CT.load_sfm_log(str(log), names + ["000004.jpg"])
    assert set(w2c) == set(names)
    for i, n in enumerate(names):
        np.testing.assert_allclose(w2c[n], np.linalg.inv(poses[i]),
                                   atol=1e-10)


def test_rotmat_qvec_roundtrip():
    from vcr_gaus_tpu.utils.colmap import qvec_to_rotmat
    rng = np.random.default_rng(1)
    for _ in range(20):
        R = _random_pose(rng)[:3, :3]
        q = CT.rotmat_to_qvec(R)
        np.testing.assert_allclose(qvec_to_rotmat(q), R, atol=1e-8)


def test_write_init_model(tmp_path):
    rng = np.random.default_rng(2)
    db_file = tmp_path / "database.db"
    db = sqlite3.connect(db_file)
    db.execute("CREATE TABLE images (image_id INTEGER, name TEXT)")
    names = [f"{i:06d}.jpg" for i in range(3)]
    for i, n in enumerate(names):
        db.execute("INSERT INTO images VALUES (?, ?)", (i + 1, n))
    db.commit()
    db.close()

    w2c = {n: _random_pose(rng) for n in names}
    out = tmp_path / "sparse"
    CT.write_init_model(w2c, str(db_file), str(out))

    from vcr_gaus_tpu.utils import colmap as CM
    cams = CM.read_cameras_text(str(out / "cameras.txt"))
    assert cams[1].model == "RADIAL" and cams[1].width == 1920
    imgs = CM.read_images_text(str(out / "images.txt"))
    assert len(imgs) == 3
    for img in imgs.values():
        R = CM.qvec_to_rotmat(img.qvec)
        np.testing.assert_allclose(R, w2c[img.name][:3, :3], atol=1e-7)
        np.testing.assert_allclose(img.tvec, w2c[img.name][:3, 3], atol=1e-7)


def test_compute_meta_box_covers_points(tmp_path):
    from vcr_gaus_tpu.utils.ply import write_points_ply
    rng = np.random.default_rng(3)
    # elongated rotated cloud
    pts = rng.normal(size=(5000, 3)) * np.array([4.0, 1.0, 0.2])
    rot = _random_pose(rng)
    pts = pts @ rot[:3, :3].T + np.array([5.0, -2.0, 1.0])
    write_points_ply(str(tmp_path / "S.ply"), pts)
    trans = _random_pose(rng)
    np.savetxt(tmp_path / "S_trans.txt", trans)

    T, scale = CT.compute_meta(str(tmp_path / "S.ply"),
                               str(tmp_path / "S_trans.txt"), subsample=1)
    inv = np.linalg.inv(trans)
    aligned = pts @ inv[:3, :3].T + inv[:3, 3]
    boxed = aligned @ T[:3, :3].T + T[:3, 3]
    assert np.all(np.abs(boxed) <= scale + 1e-9)
    # oriented box should be much tighter than the axis-aligned one
    assert np.prod(scale) < np.prod(np.abs(aligned).max(0)) * 0.9


@pytest.mark.xdist_group("subprocess")
def test_extract_priors_depth_and_allfg(tmp_path):
    from PIL import Image
    src = tmp_path / "scene"
    (src / "images").mkdir(parents=True)
    (src / "depths").mkdir()
    (src / "sparse").mkdir()
    h, w = 24, 32
    for i in range(2):
        Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
            src / "images" / f"{i:06d}.png")
        depth = 2.0 + 0.01 * np.arange(h)[:, None] + np.zeros((h, w))
        np.savez_compressed(src / "depths" / f"{i:06d}.npz",
                            depth.astype(np.float32))
    with open(src / "sparse" / "cameras.txt", "w") as fp:
        fp.write(f"1 PINHOLE {w} {h} 30 30 {w/2} {h/2}\n")

    env = cpu_subprocess_env()
    script = os.path.join(REPO, "scripts", "extract_priors.py")
    r = subprocess.run([sys.executable, script, "normals",
                        "--source", str(src), "--backend", "depth"],
                       env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    n = np.load(src / "normals" / "000000.npz")["arr_0"]
    assert n.shape == (3, h, w) and n.dtype == np.float16
    norms = np.linalg.norm(n.astype(np.float32), axis=0)
    np.testing.assert_allclose(norms[2:-2, 2:-2], 1.0, atol=1e-2)

    r = subprocess.run([sys.executable, script, "masks",
                        "--source", str(src), "--backend", "all-fg"],
                       env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    m = np.asarray(Image.open(src / "masks" / "000000.png"))
    assert m.shape == (h, w) and m.min() == 1

    # external-model backends must fail with a clear gating message
    r = subprocess.run([sys.executable, script, "normals",
                        "--source", str(src)], env=env,
                       capture_output=True, text=True)
    assert r.returncode != 0 and "DSINE" in (r.stdout + r.stderr)


def test_convert_dtu_cli(tmp_path):
    from PIL import Image
    from vcr_gaus_tpu.utils.ply import write_points_ply
    rng = np.random.default_rng(4)
    scan = tmp_path / "scan7" / "images"
    scan.mkdir(parents=True)
    for i in [0, 8, 20]:
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            scan / f"{i:06d}.png")
    stl_dir = tmp_path / "Points" / "stl"
    stl_dir.mkdir(parents=True)
    write_points_ply(str(stl_dir / "stl007_total.ply"),
                     rng.normal(size=(500, 3)))

    env = cpu_subprocess_env()
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "convert_dtu.py"),
                        "--dtu_path", str(tmp_path), "--subsample", "1"],
                       env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    meta = json.load(open(tmp_path / "scan7" / "meta.json"))
    assert np.asarray(meta["trans"]).shape == (4, 4)
    assert meta["test"] == ["000008"]
    assert meta["train"] == ["000000", "000020"]


def test_visualize_cameras_cli(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from fixtures import write_colmap_scene
    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=4, n_pts=100, width=32, height=24)
    env = dict(cpu_subprocess_env(), MPLBACKEND="Agg")
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "visualize_cameras.py"),
                        "--source", root], env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(root, "poses.png"))
