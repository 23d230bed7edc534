"""Training visualization panels (tools/visualization.py equivalents).

The reference logs render/depth/normal/D-normal/cos-weight/semantic panels to
wandb (trainer.py:452-494); this writes the same panels as PNG grids under
``logdir/vis`` (wandb is not available in this environment — the files are
drop-in loggable if it is)."""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img):
    return (np.clip(np.asarray(img, np.float32), 0, 1) * 255).astype(np.uint8)


def colorize_depth(depth, mask=None):
    """Normalized turbo-ish depth map (H,W) -> (H,W,3) u8."""
    d = np.asarray(depth, np.float32)
    m = np.asarray(mask) if mask is not None else d > 0
    if m.any():
        lo, hi = np.percentile(d[m], 2), np.percentile(d[m], 98)
    else:
        lo, hi = 0.0, 1.0
    t = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * t - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * t - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * t - 0.5), 0, 1)
    rgb = np.stack([r, g, b], -1)
    rgb[~m] = 0
    return (rgb * 255).astype(np.uint8)


def colorize_normal(normal_hw3):
    """Camera-space normal (H,W,3) in [-1,1] -> u8."""
    return _to_u8((np.asarray(normal_hw3) + 1.0) / 2.0)


def semantic_palette(labels, num_cls: int):
    """(H,W) int labels -> color image (tools/visualization.py palette)."""
    rng = np.random.default_rng(0)
    palette = rng.integers(40, 255, (max(num_cls, 2), 3)).astype(np.uint8)
    palette[0] = np.array([20, 20, 20], np.uint8)   # background
    return palette[np.clip(np.asarray(labels), 0, num_cls - 1)]


def save_panels(out_dir: str, tag: str, render_out: dict, gt_image=None,
                num_cls: int = 0) -> str:
    """Write a horizontal strip [gt | render | depth | normal | est_normal
    (| semantic)] for one view."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    cols = []
    if gt_image is not None:
        cols.append(_to_u8(np.asarray(gt_image).transpose(1, 2, 0)))
    cols.append(_to_u8(np.asarray(render_out["render"]).transpose(1, 2, 0)))
    alpha = np.asarray(render_out["alpha"])
    cols.append(colorize_depth(render_out["depth"], alpha > 0.5))
    cols.append(colorize_normal(render_out["normal"]))
    cols.append(colorize_normal(render_out["est_normal"]))
    if num_cls and "render_sem" in render_out:
        labels = np.argmax(np.asarray(render_out["render_sem"]), axis=0)
        cols.append(semantic_palette(labels, num_cls))
    strip = np.concatenate(cols, axis=1)
    path = os.path.join(out_dir, f"{tag}.png")
    Image.fromarray(strip).save(path)
    return path
