#!/usr/bin/env python
"""Mip-NeRF 360 preprocessing: write meta.json {trans, scale} for every
scene under a dataset root (reference process_data/convert_360_to_json.py:
main :154-168 — per scene, read the COLMAP model and derive concentric
bounds from the camera poses via bound_by_pose).

  python scripts/convert_360.py --data_path data/360_v2

Per-scene layout expected: <data_path>/<scene>/sparse/0/{cameras,images}.bin
(the standard Mip-NeRF 360 release layout). The optional known-pose COLMAP
re-triangulation path of the reference (create_init_files etc.) is COLMAP-
binary driven; use scripts/convert_colmap.py for that stage.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _SCRIPTS)

from make_meta import bound_by_pose  # noqa: E402

from vcr_gaus_tpu.utils import colmap as CM  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True,
                    help="root holding one sub-directory per 360 scene")
    args = ap.parse_args()

    for scene in sorted(os.listdir(args.data_path)):
        scene_path = os.path.join(args.data_path, scene)
        if not os.path.isdir(scene_path):
            continue
        colmap_dir = os.path.join(scene_path, "sparse/0")
        if not os.path.isdir(colmap_dir):
            colmap_dir = os.path.join(scene_path, "sparse")
        images_bin = os.path.join(colmap_dir, "images.bin")
        if not os.path.exists(images_bin):
            print(f"skip {scene}: no COLMAP model at {colmap_dir}")
            continue
        images = CM.read_images_binary(images_bin)
        trans, scale = bound_by_pose(images)
        meta = {"trans": trans.tolist(), "scale": scale.tolist()}
        out = os.path.join(scene_path, "meta.json")
        with open(out, "w") as f:
            json.dump(meta, f, indent=4)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
