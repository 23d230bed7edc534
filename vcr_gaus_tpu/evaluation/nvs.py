"""Novel-view-synthesis metrics + render sweeps.

PSNR/SSIM match evaluation/metrics.py:19-30 + the SSIM of
tools/loss_utils.py. LPIPS requires pretrained VGG weights, which this
offline image cannot download — `lpips()` returns None unless a weights file
is provided (evaluation/lpipsPyTorch equivalent is gated, not vendored).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..train.losses import ssim as _ssim


def psnr(img: np.ndarray, gt: np.ndarray) -> float:
    mse = np.mean((np.asarray(img, np.float64)
                   - np.asarray(gt, np.float64)) ** 2)
    return float(-10.0 * np.log10(mse + 1e-12))


def ssim(img, gt) -> float:
    return float(_ssim(jnp.asarray(img), jnp.asarray(gt)))


def lpips(img, gt, vgg_path: str | None = None, lin_path: str | None = None):
    """LPIPS(vgg) via the pure-JAX implementation (evaluation/lpips_jax.py);
    weights are user-provided files (zero-egress image) — returns None when
    unavailable. Paths default to $LPIPS_WEIGHTS (combined npz from
    scripts/convert_lpips.py) or the $LPIPS_VGG_PATH/$LPIPS_LIN_PATH pair."""
    from .lpips_jax import LPIPS
    fn = (LPIPS.maybe(vgg_path, lin_path) if vgg_path
          else LPIPS.from_env())
    return None if fn is None else fn(img, gt)


def render_sets(state, cameras, rcfg, bg, out_dir: str, sh_degree: int = 3,
                scene_extent: float = 1e9, save_gt: bool = True):
    """Render a camera list to renders/ + gt/ PNG pairs
    (evaluation/render.py:28-55). The whole render (projection -> binning ->
    kernel -> u8 quantization) runs as ONE jitted program per view; only the
    u8 image crosses back to the host."""
    import jax
    from PIL import Image

    from ..render.renderer import render
    os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
    if save_gt:
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)

    bg = jnp.asarray(bg)

    @jax.jit
    def render_u8(state, arr):
        out = render(state, arr, rcfg, bg, sh_degree,
                     scene_extent=scene_extent)
        rgb = jnp.clip(out["render"], 0, 1)
        return jnp.round(jnp.moveaxis(rgb, 0, -1) * 255).astype(jnp.uint8)

    def to_u8(x):
        # round (not floor) so gt/ and renders/ share the same quantizer
        # (torchvision save_image rounds both in the reference).
        return (np.clip(np.asarray(x), 0, 1).transpose(1, 2, 0)
                * 255 + 0.5).astype(np.uint8)

    for i, cam in enumerate(cameras):
        arr = cam.arrays() if hasattr(cam, "arrays") else cam
        img = render_u8(state, jax.tree.map(jnp.asarray, arr))
        Image.fromarray(np.asarray(img)).save(
            os.path.join(out_dir, "renders", f"{i:05d}.png"))
        if save_gt:
            Image.fromarray(to_u8(arr.image)).save(
                os.path.join(out_dir, "gt", f"{i:05d}.png"))


def evaluate_dir(out_dir: str) -> dict:
    """PSNR/SSIM/LPIPS over saved renders vs gt (evaluation/metrics.py:42-95);
    writes results.json + per_view.json. LPIPS is included when weight files
    are available (see `lpips`)."""
    from PIL import Image
    from .lpips_jax import LPIPS
    lp = LPIPS.from_env()
    rdir = os.path.join(out_dir, "renders")
    gdir = os.path.join(out_dir, "gt")
    names = sorted(os.listdir(rdir))
    per_view: dict[str, dict] = {}
    for n in names:
        r = np.asarray(Image.open(os.path.join(rdir, n)),
                       np.float32).transpose(2, 0, 1) / 255.0
        g = np.asarray(Image.open(os.path.join(gdir, n)),
                       np.float32).transpose(2, 0, 1) / 255.0
        per_view[n] = {"psnr": psnr(r, g), "ssim": ssim(r, g)}
        if lp is not None:
            per_view[n]["lpips"] = lp(r, g)
    results = {
        "PSNR": float(np.mean([v["psnr"] for v in per_view.values()])),
        "SSIM": float(np.mean([v["ssim"] for v in per_view.values()])),
    }
    if lp is not None:
        results["LPIPS"] = float(np.mean([v["lpips"]
                                          for v in per_view.values()]))
        if getattr(lp, "is_placeholder", False):
            # random-init weights: the column exercises the plumbing only
            results["LPIPS_placeholder"] = True
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(os.path.join(out_dir, "per_view.json"), "w") as f:
        json.dump(per_view, f, indent=2)
    return results
