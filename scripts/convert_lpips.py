#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS v0.1 linear heads into ONE .npz that
vcr_gaus_tpu.evaluation.lpips_jax can load (reference vendors the weights via
torchvision downloads, evaluation/lpipsPyTorch/modules/networks.py +
lpips.py:8-36 — this image has zero egress, so conversion is offline).

Inputs (obtain on any machine with internet, then copy over):
  * --vgg: torchvision `vgg16-397923af.pth` state_dict, or any .pth/.npz
    with `features.N.weight/bias` keys (an in-memory torchvision dump:
    `torch.save(torchvision.models.vgg16(weights='DEFAULT').state_dict(), p)`)
  * --lin: LPIPS v0.1 vgg heads — the official repo's
    `lpips/weights/v0.1/vgg.pth` (keys `lin{i}.model.1.weight`) or the pip
    package's equivalent (`lins.{i}.model.1.weight` also accepted)

Output: one .npz with the canonical keys (`features.N.weight/bias`,
`lin{i}.model.1.weight`). Point $LPIPS_WEIGHTS at it (or pass
--lpips_weights to render_eval.py) and the NVS metrics gain the LPIPS
column (evaluation/metrics.py:77-85 parity).

  python scripts/convert_lpips.py --vgg vgg16-397923af.pth \
      --lin lpips_v0.1_vgg.pth --out weights/lpips_vgg.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcr_gaus_tpu.evaluation.lpips_jax import _STAGES, _load_state

# expected channel widths of the five LPIPS vgg stages
_STAGE_CH = [64, 128, 256, 512, 512]


def convert(vgg_path: str, lin_path: str, out_path: str) -> dict:
    vgg = _load_state(vgg_path)
    lin = _load_state(lin_path)
    out: dict[str, np.ndarray] = {}

    for si, stage in enumerate(_STAGES):
        for i in stage:
            for suffix in ("weight", "bias"):
                for key in (f"features.{i}.{suffix}", f"{i}.{suffix}"):
                    if key in vgg:
                        out[f"features.{i}.{suffix}"] = np.asarray(
                            vgg[key], np.float32)
                        break
                else:
                    raise KeyError(
                        f"vgg16 features.{i}.{suffix} not in {vgg_path} "
                        f"(keys: {sorted(vgg)[:5]}...)")
        w = out[f"features.{stage[-1]}.weight"]
        if w.shape[0] != _STAGE_CH[si]:
            raise ValueError(
                f"stage {si} out-channels {w.shape[0]} != {_STAGE_CH[si]} "
                f"— is {vgg_path} really a torchvision vgg16 state_dict?")

    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin:
                v = np.asarray(lin[key], np.float32).reshape(-1)
                break
        else:
            raise KeyError(f"lin{i} head not in {lin_path} "
                           f"(keys: {sorted(lin)})")
        if v.shape[0] != _STAGE_CH[i]:
            raise ValueError(f"lin{i} width {v.shape[0]} != {_STAGE_CH[i]}")
        if (v < 0).any():
            # LPIPS applies abs at load; heads are non-negative by training
            v = np.abs(v)
        out[f"lin{i}.model.1.weight"] = v

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16 state_dict (.pth or .npz)")
    ap.add_argument("--lin", required=True,
                    help="LPIPS v0.1 vgg linear heads (.pth or .npz)")
    ap.add_argument("--out", default="weights/lpips_vgg.npz")
    ap.add_argument("--selftest", action="store_true",
                    help="load the result and score a test pair")
    args = ap.parse_args()

    out = convert(args.vgg, args.lin, args.out)
    n_params = sum(v.size for v in out.values())
    print(f"wrote {args.out}: {len(out)} arrays, {n_params:,} params")

    if args.selftest:
        from vcr_gaus_tpu.evaluation.lpips_jax import LPIPS
        fn = LPIPS(args.out)
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
        d_same = fn(a, a)
        d_diff = fn(a, 1.0 - a)
        print(f"selftest: d(x,x)={d_same:.6f} d(x,1-x)={d_diff:.4f}")
        assert d_same < 1e-6 and d_diff > d_same
    print(f"use: export LPIPS_WEIGHTS={os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
