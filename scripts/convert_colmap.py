#!/usr/bin/env python
"""COLMAP SfM wrapper for custom datasets (reference process_data/convert.py):
feature extraction -> matching -> mapping -> undistortion. Requires the
external `colmap` binary; this stays an offline CPU tool — its outputs
(sparse/, undistorted images/) define the framework's input contract.

  python scripts/convert_colmap.py --source data/myscene [--no_gpu]
  python scripts/convert_colmap.py --source data/myscene --make_meta
"""

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd).returncode
    if rc != 0:
        raise SystemExit(f"colmap step failed ({rc}): {' '.join(cmd)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="dir with input/ images")
    ap.add_argument("--camera", default="OPENCV")
    ap.add_argument("--colmap_executable", default="colmap")
    ap.add_argument("--no_gpu", action="store_true")
    ap.add_argument("--make_meta", action="store_true",
                    help="also derive meta.json from the sparse points")
    args = ap.parse_args()

    if shutil.which(args.colmap_executable) is None:
        raise SystemExit(
            "colmap binary not found — install COLMAP or pass "
            "--colmap_executable (preprocessing is an offline external step)")

    src = args.source
    use_gpu = "0" if args.no_gpu else "1"
    os.makedirs(os.path.join(src, "distorted/sparse"), exist_ok=True)
    run([args.colmap_executable, "feature_extractor",
         "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input",
         "--ImageReader.single_camera", "1",
         "--ImageReader.camera_model", args.camera,
         "--SiftExtraction.use_gpu", use_gpu])
    run([args.colmap_executable, "exhaustive_matcher",
         "--database_path", f"{src}/distorted/database.db",
         "--SiftMatching.use_gpu", use_gpu])
    run([args.colmap_executable, "mapper",
         "--database_path", f"{src}/distorted/database.db",
         "--image_path", f"{src}/input",
         "--output_path", f"{src}/distorted/sparse",
         "--Mapper.ba_global_function_tolerance", "0.000001"])
    run([args.colmap_executable, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src, "--output_type", "COLMAP"])
    # move sparse model into sparse/0 (convert.py's final layout shuffle)
    os.makedirs(f"{src}/sparse/0", exist_ok=True)
    for f in os.listdir(f"{src}/sparse"):
        if f != "0":
            shutil.move(os.path.join(src, "sparse", f),
                        os.path.join(src, "sparse", "0", f))
    if args.make_meta:
        run([sys.executable,
             os.path.join(os.path.dirname(__file__), "make_meta.py"),
             "--source", src])
    print("done")


if __name__ == "__main__":
    main()
