#!/usr/bin/env python
"""NVS render + metrics CLI (reference evaluation/render.py + metrics.py):

  python render_eval.py --cfg_path output/run/config.yaml [--skip_train]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_test", action="store_true")
    ap.add_argument("--lpips_weights", default=None,
                    help="combined LPIPS npz from scripts/convert_lpips.py"
                         " (default: $LPIPS_WEIGHTS); adds the LPIPS column")
    args, overrides = ap.parse_known_args()
    if args.lpips_weights:
        os.environ["LPIPS_WEIGHTS"] = args.lpips_weights

    import numpy as np

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.data.scene import load_scene_info
    from vcr_gaus_tpu.evaluation import nvs
    from vcr_gaus_tpu.models import ply_io
    from vcr_gaus_tpu.render.renderer import RenderConfig

    cfg = Config(args.cfg_path, overrides=overrides)
    from vcr_gaus_tpu.ops import rasterize_tpu as _K
    _K.set_tile(int(cfg.tpu.get("tile", 16)))
    logdir = os.path.dirname(os.path.abspath(args.cfg_path))
    if args.iteration > 0:
        it = args.iteration
    else:
        dirs = glob.glob(os.path.join(logdir, "point_cloud", "iteration_*"))
        it = max(int(os.path.basename(d).split("_")[1]) for d in dirs)
    state = ply_io.load_gaussian_ply(
        os.path.join(logdir, "point_cloud", f"iteration_{it}",
                     "point_cloud.ply"), max_sh_degree=cfg.model.sh_degree)
    info = load_scene_info(cfg.model.source_path,
                           images_dir=cfg.model.images,
                           eval_split=cfg.model.eval,
                           llffhold=cfg.model.llffhold,
                           ratio=cfg.model.ratio,
                           use_meta_split=cfg.model.split,
                           resolution=cfg.model.resolution,
                           data_device=str(getattr(cfg.model, "data_device",
                                                   "host")))
    cam0 = info.train_cameras[0]
    rcfg = RenderConfig(width=cam0.width, height=cam0.height,
                        depth_mode=cfg.model.depth_type,
                        entry_budget=1 << 21, mask_depth_thr=1e9)
    bg = np.array([1, 1, 1] if cfg.model.white_background else [0, 0, 0],
                  np.float32)
    for name, cams, skip in (
            ("train", info.train_cameras, args.skip_train),
            ("test", info.test_cameras, args.skip_test)):
        if skip or not cams:
            continue
        out_dir = os.path.join(logdir, name, f"ours_{it}")
        nvs.render_sets(state, cams, rcfg, bg, out_dir,
                        sh_degree=cfg.model.sh_degree,
                        scene_extent=info.radius)
        results = nvs.evaluate_dir(out_dir)
        print(name, results)


if __name__ == "__main__":
    main()
