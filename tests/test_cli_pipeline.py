"""The three top-level CLIs chained end-to-end via subprocess, sharing only
the filesystem — the reference's pipeline contract (run_base.py check_finish
gates between train -> mesh -> eval stages)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from fixtures import cpu_subprocess_env, write_colmap_scene


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    scene = str(tmp_path_factory.mktemp("cli_scene"))
    logdir = str(tmp_path_factory.mktemp("cli_logs"))
    write_colmap_scene(scene, n_cams=6, n_pts=300, width=64, height=48,
                       with_priors=True)
    return scene, logdir


def run_cli(script, *args):
    r = subprocess.run([sys.executable, os.path.join(REPO, script), *args],
                       env=cpu_subprocess_env(), capture_output=True,
                       text=True)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.xdist_group("subprocess")
def test_cli_pipeline(pipeline_dirs):
    scene, logdir = pipeline_dirs

    # stage 1: train (tiny schedule via dotted overrides)
    run_cli("train.py", "--config=configs/config_base.yaml",
            f"--model.source_path={scene}", f"--logdir={logdir}",
            "--model.depth_type=traditional",
            "--optim.iterations=60", "--optim.densify_from_iter=1000",
            "--tpu.capacity=1024",
            "--train.save_iterations=[60]",
            "--train.checkpoint_iterations=[60]",
            "--train.test_iterations=[]")
    ply = os.path.join(logdir, "point_cloud", "iteration_60",
                       "point_cloud.ply")
    assert os.path.exists(ply), "check_finish: PLY missing"
    assert os.path.exists(os.path.join(logdir, "config.yaml"))
    assert os.path.exists(os.path.join(logdir, "cameras.json"))

    # stage 2: mesh extraction from the saved run. The reference-parity
    # default (prune_outliers on, tools/depth2mesh.py:144) denoises with a
    # 0.01*extent radius test that a 300-point synthetic cloud cannot pass,
    # so the content assertions opt out; the default path is exercised below.
    run_cli("depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
            "--voxel_size=0.08", "--max_depth=8", "--no-prune_outliers")
    mesh = os.path.join(logdir, "ours.ply")
    assert os.path.exists(mesh), "check_finish: mesh missing"
    from vcr_gaus_tpu.utils.ply import read_ply
    d = read_ply(mesh)
    assert len(d["x"]) > 50

    # stage 2b: unbounded (mip-360 contraction) meshing from the same run
    run_cli("depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
            "--unbounded", "--resolution=96", "--mesh_name=ours_unbounded",
            "--no-prune_outliers")
    du = read_ply(os.path.join(logdir, "ours_unbounded.ply"))
    assert len(du["x"]) > 50

    # stage 2c: the default prune-on path runs end-to-end and reports the
    # inside/outlier split (raw-depth fusion flag exercised too)
    out2c = run_cli("depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
                    "--voxel_size=0.08", "--max_depth=8",
                    "--no-normalize_depth", "--mesh_name=ours_pruned")
    assert "prune_outliers: kept" in out2c
    assert os.path.exists(os.path.join(logdir, "ours_pruned.ply"))

    # stage 3: NVS render + metrics (no test split in the tiny scene ->
    # evaluate the train renders, the 360 pipeline protocol)
    run_cli("render_eval.py", f"--cfg_path={logdir}/config.yaml")
    results = None
    for root, _, files in os.walk(logdir):
        if "results.json" in files:
            results = json.load(open(os.path.join(root, "results.json")))
    assert results is not None and "PSNR" in results
    assert results["PSNR"] > 10, results
