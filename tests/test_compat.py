"""Legacy 3DGS compat layer (reference arguments/__init__.py,
evaluation/full_eval.py)."""

import os
import subprocess
import sys
from argparse import ArgumentParser

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vcr_gaus_tpu.compat.arguments import (  # noqa: E402
    ModelParams, OptimizationParams, PipelineParams, get_combined_args,
    write_cfg_args)


def test_param_groups_register_and_extract():
    parser = ArgumentParser()
    mp, op, pp = ModelParams(), OptimizationParams(), PipelineParams()
    mp.register(parser, "Loading Parameters")
    op.register(parser, "Optimization Parameters")
    pp.register(parser, "Pipeline Parameters")
    args = parser.parse_args(
        ["-s", "data/scene", "--iterations", "7000", "--white_background"])
    g = mp.extract(args)
    assert g.source_path == os.path.abspath("data/scene")
    assert g.white_background is True
    assert g.sh_degree == 3
    o = op.extract(args)
    assert o.iterations == 7000
    assert o.densify_grad_threshold == 0.0002
    over = mp.to_overrides(g)
    assert over["model.source_path"] == g.source_path
    assert over["model.white_background"] is True


def test_cfg_args_roundtrip(tmp_path):
    cfg = {"model": {"sh_degree": 2, "source_path": "x"},
           "optim": {"iterations": 100}, "logdir": str(tmp_path)}
    write_cfg_args(cfg, str(tmp_path))
    assert os.path.isfile(tmp_path / "cfg_args")

    parser = ArgumentParser()
    parser.add_argument("--model_path", default=str(tmp_path))
    parser.add_argument("--iteration", type=int, default=None)
    merged = get_combined_args(parser, ["--iteration", "7"])
    assert merged.model_sh_degree == 2
    assert merged.optim_iterations == 100
    assert merged.iteration == 7


def test_full_eval_dry_run():
    r = subprocess.run(
        [sys.executable, "scripts/full_eval.py", "--dry",
         "--mipnerf360", "m360", "--tanksandtemples", "tnt",
         "--deepblending", "db", "--output_path", "out"],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # 13 scenes trained, 2 renders each
    assert r.stdout.count("train.py") == 13
    assert r.stdout.count("render_eval.py") == 26
    assert "--iteration=30000" in r.stdout
