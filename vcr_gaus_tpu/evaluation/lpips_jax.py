"""LPIPS (vgg) in pure JAX (reference evaluation/lpipsPyTorch/modules/*):
VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized, squared
differences reweighted by the LPIPS linear heads, spatially averaged and
summed over stages.

The image ships no pretrained weights (zero egress), so weights load from
user-provided files:
  * one combined .npz produced by ``scripts/convert_lpips.py`` (recommended;
    holds both the vgg convs and the lin heads — set $LPIPS_WEIGHTS or pass
    --lpips_weights to render_eval.py), or
  * vgg_path: torchvision vgg16 state_dict (.pth, torch.load cpu) or an .npz
    with the same `features.N.weight/bias` keys, plus
  * lin_path: LPIPS v0.1 vgg linear heads (.pth / .npz, keys
    `lin{i}.model.1.weight`)
`lpips_fn(...)` returns None when weights are missing — callers degrade
gracefully (metrics JSON simply omits the column, evaluation/metrics.py:77-85
behavior with the column present-but-null).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# conv layer indices of torchvision vgg16.features, grouped by stage
_STAGES = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
# (out_ch, in_ch) of every conv layer, keyed by torchvision features index
_CONV_CH = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
            10: (256, 128), 12: (256, 256), 14: (256, 256),
            17: (512, 256), 19: (512, 512), 21: (512, 512),
            24: (512, 512), 26: (512, 512), 28: (512, 512)}
_STAGE_CH = [64, 128, 256, 512, 512]
# LPIPS input scaling layer (modules/networks.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_state(path: str) -> dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return {k: np.asarray(v) for k, v in np.load(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_weights(vgg_path: str, lin_path: str | None = None):
    """-> (convs per stage [(W,b), ...], lins [w]) as numpy arrays.
    With lin_path=None, vgg_path must be a combined file holding both key
    families (the scripts/convert_lpips.py output)."""
    vgg = _load_state(vgg_path)
    lin = _load_state(lin_path) if lin_path else vgg
    stages = []
    for stage in _STAGES:
        convs = []
        for i in stage:
            w = vgg.get(f"features.{i}.weight")
            if w is None:                      # allow plain vgg16 dumps
                w = vgg[f"{i}.weight"]
                b = vgg[f"{i}.bias"]
            else:
                b = vgg[f"features.{i}.bias"]
            convs.append((np.asarray(w, np.float32),
                          np.asarray(b, np.float32)))
        stages.append(convs)
    lins = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin:
                lins.append(np.asarray(lin[key], np.float32).reshape(-1))
                break
        else:
            raise KeyError(f"lin{i} weights not found in {lin_path}")
    return stages, lins


PLACEHOLDER_KEY = "__placeholder__"


def write_placeholder_weights(path: str, seed: int = 0) -> str:
    """Write a DETERMINISTIC random-init combined weights file in the
    scripts/convert_lpips.py .npz format, tagged with ``__placeholder__``.

    This is NOT the pretrained LPIPS metric — scores from it are
    meaningless as perceptual distances. It exists so the full NVS metrics
    plumbing (evaluation/metrics.py:77-85 parity: the LPIPS column,
    results.json layout, jit path) runs end-to-end inside the zero-egress
    image; `evaluate_dir` flags results computed with it. He-init convs +
    positive lin heads keep the architecture invariants (d(x,x)=0,
    symmetry, positivity) exercised at the real net's widths."""
    rng = np.random.default_rng(seed)
    out: dict[str, np.ndarray] = {PLACEHOLDER_KEY: np.asarray(1)}
    for i, (co, ci) in _CONV_CH.items():
        std = float(np.sqrt(2.0 / (ci * 9)))
        out[f"features.{i}.weight"] = rng.normal(
            scale=std, size=(co, ci, 3, 3)).astype(np.float32)
        out[f"features.{i}.bias"] = np.zeros(co, np.float32)
    for i, c in enumerate(_STAGE_CH):
        out[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(scale=0.1, size=(1, c, 1, 1))).astype(np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **out)
    return path


def placeholder_path() -> str:
    """Cache location for the auto-generated placeholder file."""
    return os.path.join(os.path.expanduser("~"), ".cache", "vcr_gaus_tpu",
                        "lpips_placeholder.npz")


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x[None], jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    return jax.nn.relu(y + jnp.asarray(b)[:, None, None])


def lpips_pair(img, gt, stages, lins):
    """img/gt: (3,H,W) in [0,1]. Returns the LPIPS distance (scalar)."""

    def feats(x):
        x = 2.0 * x - 1.0                       # [-1,1] like the reference
        x = (x - jnp.asarray(_SHIFT)[:, None, None]) \
            / jnp.asarray(_SCALE)[:, None, None]
        out = []
        for convs in stages:
            for (w, b) in convs:
                x = _conv(x, w, b)
            out.append(x / jnp.sqrt(jnp.sum(x * x, 0, keepdims=True) + 1e-10))
            x = -jax.lax.reduce_window(       # 2x2 max pool between stages
                -x, jnp.inf, jax.lax.min, (1, 2, 2), (1, 2, 2), "VALID")
        return out

    fa, fb = feats(jnp.asarray(img)), feats(jnp.asarray(gt))
    dist = 0.0
    for a, b, w in zip(fa, fb, lins):
        d = (a - b) ** 2
        dist = dist + jnp.mean(jnp.sum(jnp.asarray(w)[:, None, None] * d, 0))
    return dist


class LPIPS:
    """Callable wrapper; None-safe construction from optional weight paths."""

    def __init__(self, vgg_path: str, lin_path: str | None = None):
        self.stages, self.lins = load_weights(vgg_path, lin_path)
        self.is_placeholder = bool(
            vgg_path.endswith(".npz")
            and PLACEHOLDER_KEY in np.load(vgg_path))
        self._fn = jax.jit(lambda a, b: lpips_pair(a, b, self.stages,
                                                   self.lins))

    def __call__(self, img, gt) -> float:
        return float(self._fn(jnp.asarray(img), jnp.asarray(gt)))

    @staticmethod
    def maybe(vgg_path: str | None, lin_path: str | None = None):
        """Combined-file form (lin_path falsy) or the two-file form."""
        if vgg_path and os.path.exists(vgg_path):
            if not lin_path:
                return LPIPS(vgg_path)
            if os.path.exists(lin_path):
                return LPIPS(vgg_path, lin_path)
        return None

    @staticmethod
    def from_env():
        """$LPIPS_WEIGHTS (combined npz from scripts/convert_lpips.py),
        falling back to the $LPIPS_VGG_PATH + $LPIPS_LIN_PATH pair.
        The literal value ``placeholder`` auto-generates the deterministic
        random-init file (see write_placeholder_weights) — full plumbing,
        flagged non-pretrained scores."""
        combined = os.environ.get("LPIPS_WEIGHTS")
        if combined == "placeholder":
            p = placeholder_path()
            if not os.path.exists(p):
                write_placeholder_weights(p)
            return LPIPS(p)
        if combined:
            return LPIPS.maybe(combined)
        return LPIPS.maybe(os.environ.get("LPIPS_VGG_PATH"),
                           os.environ.get("LPIPS_LIN_PATH"))
