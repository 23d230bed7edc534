"""Benchmark pipeline runners driven end-to-end via subprocess on the
synthetic fixture scene: stage chaining, check_finish gates, and the TNT
voxel-size retry ladder (reference python_scripts/run_{dtu,tnt}.py,
run_base.py:46-50)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from fixtures import cpu_subprocess_env, write_colmap_scene


def run_script(script, *args, check=True):
    r = subprocess.run([sys.executable, os.path.join(REPO, script), *args],
                       env=cpu_subprocess_env(), capture_output=True,
                       text=True, cwd=REPO, timeout=900)
    if check:
        assert r.returncode == 0, f"{script} failed:\n{r.stdout[-3000:]}\n" \
                                  f"{r.stderr[-3000:]}"
    return r


@pytest.mark.xdist_group("subprocess")
def test_run_dtu_pipeline(tmp_path):
    """train -> mesh -> Chamfer eval chain for one scan; aggregate JSON."""
    data_root = tmp_path / "dtu"
    scan = data_root / "scan24"
    write_colmap_scene(str(scan), n_cams=6, n_pts=300, width=64, height=48,
                       with_priors=True)
    # synthetic GT point cloud near the fixture cube surface
    from vcr_gaus_tpu.utils.ply import write_points_ply
    from fixtures import make_cube_points
    stl_dir = tmp_path / "dtu_eval" / "Points" / "stl"
    stl_dir.mkdir(parents=True)
    pts, _ = make_cube_points(2000)
    write_points_ply(str(stl_dir / "stl024_total.ply"), pts)

    out = tmp_path / "out_dtu"
    r = run_script(
        "scripts/run_dtu.py", "--data_root", str(data_root),
        "--eval_dir", str(tmp_path / "dtu_eval"), "--out", str(out),
        "--scans", "24", "--iterations", "40", "--voxel_size", "0.08",
        "--tpu.capacity=1024",
        "--model.depth_type=traditional", "--model.normal_folder=normals",
        "--optim.densify_from_iter=1000", "--train.test_iterations=[]",
        "--train.save_iterations=[40]")
    assert os.path.exists(out / "scan24" / "ours.ply"), r.stdout[-2000:]
    assert os.path.exists(out / "scan24" / "results.json")
    res = json.loads(open(out / "scan24" / "results.json").read())
    assert {"mean_d2s", "mean_s2d", "overall"} <= set(res)
    assert "mean_chamfer" in r.stdout


@pytest.mark.xdist_group("subprocess")
def test_run_tnt_pipeline_with_voxel_ladder(tmp_path):
    """The first (too-fine) voxel size aborts on the grid-size guard and the
    ladder retries coarser — the reference's OOM-resilience loop
    (run_tnt.py:47-48,82-85) — then F1 eval aggregates."""
    data_root = tmp_path / "tnt"
    scene = data_root / "TestScene"
    write_colmap_scene(str(scene), n_cams=6, n_pts=300, width=64, height=48,
                       with_priors=True)
    from vcr_gaus_tpu.utils.ply import write_points_ply
    from fixtures import make_cube_points
    gt_dir = tmp_path / "tnt_gt" / "TestScene"
    gt_dir.mkdir(parents=True)
    pts, _ = make_cube_points(2000)
    write_points_ply(str(gt_dir / "TestScene.ply"), pts)

    out = tmp_path / "out_tnt"
    r = run_script(
        "scripts/run_tnt.py", "--data_root", str(data_root),
        "--gt_root", str(tmp_path / "tnt_gt"), "--out", str(out),
        "--scenes", "TestScene", "--iterations", "40",
        "--voxel_ladder", "0.0001", "0.08", "--max_voxels", "2000000",
        "--tpu.capacity=1024",
        "--model.depth_type=traditional",
        "--model.use_decoupled_appearance=false",
        "--optim.loss_weight.semantic=0",
        "--optim.densify_from_iter=1000", "--train.test_iterations=[]",
        "--train.save_iterations=[40]")
    # ladder: the 0.0001 attempt must have failed, the 0.08 one succeeded
    assert "--voxel_size=0.0001" in r.stdout
    assert "--voxel_size=0.08" in r.stdout
    assert os.path.exists(out / "TestScene" / "ours.ply"), r.stdout[-2000:]
    assert os.path.exists(out / "TestScene" / "metrics.txt")
    assert "mean_f1" in r.stdout
    res = json.loads(r.stdout[r.stdout.rindex('{\n  "per_scene"'):])
    assert "F-score" in res["per_scene"]["TestScene"]

    # check_finish: a missing point_cloud/ gate aborts the scene cleanly
    _check_finish_case(tmp_path, data_root)


@pytest.mark.xdist_group("subprocess")
def test_run_scannetpp_in_process_scene_dp(tmp_path):
    """The multi-scene stretch config end-to-end (VERDICT r3 #7): two tiny
    scenes train CONCURRENTLY inside ONE process, each pinned to its own
    device of a virtual 8-CPU mesh via dp.scene_dispatch (the TPU-native
    analog of the reference's one-scene-per-GPU pool, run_base.py:13-43),
    then the mesh + NVS-eval stages chain per scene with check_finish
    gates and per-scene logdirs."""
    import re

    data_root = tmp_path / "scannetpp"
    for s in ("sceneA", "sceneB"):
        write_colmap_scene(str(data_root / s), n_cams=6, n_pts=300,
                           width=64, height=48, with_priors=True)
    out = tmp_path / "out_spp"
    env = cpu_subprocess_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_scannetpp.py"),
         "--data_root", str(data_root), "--out", str(out),
         "--in_process", "8", "--iterations", "40", "--voxel_size", "0.08",
         "--tpu.capacity=1024", "--model.depth_type=traditional",
         "--model.llffhold=3",   # fixture has no meta split lists
         "--optim.densify_from_iter=1000", "--train.test_iterations=[]",
         "--train.save_iterations=[40]"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=1800)
    assert r.returncode == 0, f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}"

    # both scenes trained, on two DISTINCT devices of the virtual mesh
    devs = re.findall(r"trained in-process on device (\S+)", r.stdout)
    assert len(devs) == 2 and len(set(devs)) == 2, r.stdout[-2000:]

    for s in ("sceneA", "sceneB"):
        assert os.path.isdir(out / s / "point_cloud"), s
        assert os.path.exists(out / s / "ours.ply"), s
    res = json.loads(r.stdout[r.stdout.rindex('{\n  "per_scene"'):])
    assert res["ok"] == {"sceneA": True, "sceneB": True}
    assert "mean_psnr" in res


def test_runner_dry_runs(tmp_path):
    """Command templating of the remaining runners (no training): stage
    commands printed per scene in order."""
    for script, extra, stages in (
            ("scripts/run_mipnerf360.py", [], ["train.py", "render_eval.py"]),
            ("scripts/run_scannetpp.py", ["--parallel", "2"],
             ["train.py", "depth2mesh.py", "render_eval.py"])):
        d = tmp_path / os.path.basename(script)
        for s in ("sceneA", "sceneB"):
            (d / s).mkdir(parents=True)
        r = run_script(script, "--data_root", str(d),
                       "--out", str(tmp_path / "out"), "--dry",
                       "--scenes", "sceneA", "sceneB", *extra)
        for stage in stages:
            assert r.stdout.count(stage) == 2, (script, stage, r.stdout)


def _check_finish_case(tmp_path, data_root):
    bad_out = tmp_path / "out_bad"
    r2 = run_script(
        "scripts/run_tnt.py", "--data_root", str(data_root),
        "--gt_root", str(tmp_path / "tnt_gt"), "--out", str(bad_out),
        "--scenes", "TestScene", "--iterations", "40",
        "--nonexistent.key=1")     # strict-merge rejects -> train fails
    assert "TRAIN FAILED" in r2.stdout or "check_finish FAILED" in r2.stdout
