#!/usr/bin/env python
"""Monocular prior extraction: per-image normal maps and semantic background
masks (reference process_data/extract_normal.py / extract_mask.py).

The reference runs two external checkpointed models offline — DSINE (or
GeoWizard) for normals and Grounded-SAM for text-prompted background masks.
Those models are not part of the framework; this tool keeps the same OUTPUT
CONTRACT so any extractor can be dropped in:

  normals/<stem>.npz   float16 arr_0, (3,H,W) camera-space normals in [-1,1]
                       (extract_normal.py:237-250)
  masks/<stem>.png     uint8 label map, 0 = background (sky/window/floor per
                       tools/semantic_id.py), 1 = foreground
                       (extract_mask.py:116-130)

Backends:
  normals --backend dsine   import the external DSINE repo (DSINE_PATH env)
          --backend depth   derive normals from existing depth .npz maps +
                            COLMAP intrinsics (cross-product of the
                            backprojected depth gradients — the same math
                            the renderer's est_normal uses); functional
                            offline, useful for sensor-depth datasets
  masks   --backend gsam    import the external Grounded-SAM repo (GSAM_PATH)
          --backend all-fg  write constant foreground masks (disables the
                            semantic loss semantics-free; lets the pipeline
                            run before real masks exist)

  python scripts/extract_priors.py normals --source data/scene --backend depth
  python scripts/extract_priors.py masks --source data/scene --backend all-fg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _image_stems(src):
    img_dir = os.path.join(src, "images")
    if not os.path.isdir(img_dir):
        raise SystemExit(f"{img_dir} not found")
    names = sorted(n for n in os.listdir(img_dir)
                   if n.lower().endswith((".jpg", ".jpeg", ".png")))
    return img_dir, names


def _intrinsics(src):
    """fx, fy, cx, cy from the COLMAP sparse model (the reference feeds
    DSINE the COLMAP intrinsics, extract_normal.py:208-232)."""
    from vcr_gaus_tpu.utils import colmap as CM
    for sub in ("sparse/0", "sparse"):
        d = os.path.join(src, sub)
        if os.path.exists(os.path.join(d, "cameras.bin")):
            cams = CM.read_cameras_binary(os.path.join(d, "cameras.bin"))
            break
        if os.path.exists(os.path.join(d, "cameras.txt")):
            cams = CM.read_cameras_text(os.path.join(d, "cameras.txt"))
            break
    else:
        return None
    cam = next(iter(cams.values()))
    p = cam.params
    if cam.model == "PINHOLE":
        return p[0], p[1], p[2], p[3]
    return p[0], p[0], p[1], p[2]           # SIMPLE_PINHOLE / RADIAL


def normals_from_depth(src, out_dir):
    """Normals as the cross product of the backprojected depth-map gradients
    (tools/normal_utils.py:30-41 applied offline)."""
    import jax.numpy as jnp
    from vcr_gaus_tpu.utils.graphics import compute_normals_from_depth

    depth_dir = os.path.join(src, "depths")
    if not os.path.isdir(depth_dir):
        raise SystemExit(f"--backend depth needs {depth_dir}/<stem>.npz maps")
    intr = _intrinsics(src)
    if intr is None:
        raise SystemExit("no COLMAP sparse model found for intrinsics")
    fx, fy, cx, cy = intr
    os.makedirs(out_dir, exist_ok=True)
    _, names = _image_stems(src)
    for name in names:
        stem = os.path.splitext(name)[0]
        dpath = os.path.join(depth_dir, stem + ".npz")
        if not os.path.exists(dpath):
            print(f"[skip] no depth for {stem}")
            continue
        depth = np.load(dpath)["arr_0"].astype(np.float32)
        h, w = depth.shape[-2:]
        sx, sy = w / (2 * cx), h / (2 * cy)
        K = jnp.asarray([[fx * sx, 0, w / 2], [0, fy * sy, h / 2], [0, 0, 1]])
        n = np.asarray(compute_normals_from_depth(jnp.asarray(depth), K))
        np.savez_compressed(os.path.join(out_dir, stem + ".npz"),
                            np.moveaxis(n, -1, 0).astype(np.float16))
        print(f"[normal] {stem}")


def normals_dsine(src, out_dir):
    dsine = os.environ.get("DSINE_PATH")
    if not dsine or not os.path.isdir(dsine):
        raise SystemExit(
            "DSINE not available: clone github.com/baegwangbin/DSINE, "
            "download its checkpoint, and set DSINE_PATH. The framework only "
            "consumes the npz outputs (SURVEY.md §2.4) — any monocular "
            "normal estimator with the same output contract works.")
    sys.path.insert(0, dsine)
    raise SystemExit("wire DSINE's test_samples() here against your "
                     "checkout; see reference extract_normal.py:208-252")


def masks_all_fg(src, out_dir):
    from PIL import Image
    img_dir, names = _image_stems(src)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        stem = os.path.splitext(name)[0]
        with Image.open(os.path.join(img_dir, name)) as im:
            w, h = im.size
        Image.fromarray(np.ones((h, w), np.uint8)).save(
            os.path.join(out_dir, stem + ".png"))
        print(f"[mask] {stem} (all-foreground)")


def masks_gsam(src, out_dir):
    gsam = os.environ.get("GSAM_PATH")
    if not gsam or not os.path.isdir(gsam):
        raise SystemExit(
            "Grounded-SAM not available: set GSAM_PATH to a checkout with "
            "checkpoints. Prompts: 'sky.' (outdoor) / 'window.floor.' "
            "(indoor); background pixels get label 0 "
            "(vcr_gaus_tpu/data/semantic_ids.py).")
    raise SystemExit("wire Grounded-SAM inference here; see reference "
                     "extract_mask.py:27-30,116-130")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["normals", "masks"])
    ap.add_argument("--source", required=True)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.kind == "normals":
        out = args.out or os.path.join(args.source, "normals")
        backend = args.backend or "dsine"
        {"dsine": normals_dsine, "depth": normals_from_depth}[backend](
            args.source, out)
    else:
        out = args.out or os.path.join(args.source, "masks")
        backend = args.backend or "gsam"
        {"gsam": masks_gsam, "all-fg": masks_all_fg}[backend](
            args.source, out)


if __name__ == "__main__":
    main()
