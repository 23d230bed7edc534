"""Gaussian model PLY + checkpoint IO.

The PLY vertex layout is bit-compatible with the reference
(scene/gaussian_model.py:272-311): x,y,z, nx,ny,nz(=0), f_dc_0..2,
f_rest_0..3K-1 (channel-major), opacity, scale_0..2, rot_0..3
[, obj_dc_0..S-1] — all raw (pre-activation) float32 values. Only the active
prefix of the padded state is written.

Full training checkpoints (including Adam moments and densify stats —
the reference's `capture()`/torch.save, trainer.py:428-430) go to .npz.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def _flat(a) -> int:
    """Product of the trailing dims — an explicit reshape width so a
    zero-row array still reshapes (np can't infer -1 from 0 elements)."""
    return int(np.prod(a.shape[1:]))

from ..utils.ply import read_ply, write_ply
from . import gaussians as GM


def _compact(state: GM.GaussianState) -> dict[str, np.ndarray]:
    act = np.asarray(state.active)
    p = state.params
    return {k: np.asarray(v)[act] for k, v in p._asdict().items()}


def save_gaussian_ply(state: GM.GaussianState, path: str) -> None:
    d = _compact(state)
    n = d["xyz"].shape[0]
    # explicit flat dims: reshape(n, -1) cannot infer when n == 0 (an empty
    # model must still serialize — e.g. after a degenerate prune)
    f_dc = d["f_dc"].transpose(0, 2, 1).reshape(n, _flat(d["f_dc"]))
    f_rest = d["f_rest"].transpose(0, 2, 1).reshape(n, _flat(d["f_rest"]))
    props: dict[str, np.ndarray] = {}
    for i, k in enumerate("xyz"):
        props[k] = d["xyz"][:, i].astype(np.float32)
    for k in ("nx", "ny", "nz"):
        props[k] = np.zeros(n, np.float32)
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
    props["opacity"] = d["logit_opacity"][:, 0].astype(np.float32)
    for i in range(3):
        props[f"scale_{i}"] = d["log_scale"][:, i].astype(np.float32)
    for i in range(4):
        props[f"rot_{i}"] = d["quat"][:, i].astype(np.float32)
    ch_sem = d["obj_dc"].shape[2]
    if ch_sem:
        obj = d["obj_dc"].transpose(0, 2, 1).reshape(n, _flat(d["obj_dc"]))
        for i in range(obj.shape[1]):
            props[f"obj_dc_{i}"] = obj[:, i].astype(np.float32)
    write_ply(path, props)


def load_gaussian_ply(path: str, capacity: int | None = None,
                      max_sh_degree: int = 3) -> GM.GaussianState:
    """Load a 3DGS-layout PLY (ours or the reference's) into a padded state
    (scene/gaussian_model.py:366-423)."""
    d = read_ply(path)
    n = len(d["x"])
    if capacity is None:
        capacity = n
    assert n <= capacity
    k_rest = 3 * (max_sh_degree + 1) ** 2 - 3
    f_rest_names = sorted((k for k in d if k.startswith("f_rest_")),
                          key=lambda s: int(s.split("_")[-1]))
    assert len(f_rest_names) == k_rest, (len(f_rest_names), k_rest)
    f_rest = np.stack([d[k] for k in f_rest_names], 1).reshape(
        n, 3, -1).transpose(0, 2, 1)                          # (N, K, 3)
    f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], 1)[:, None, :]
    obj_names = sorted((k for k in d if k.startswith("obj_dc_")),
                       key=lambda s: int(s.split("_")[-1]))
    ch_sem = len(obj_names)
    p = GM.zeros_params(capacity, max_sh_degree, ch_sem)

    def pad(a, v):
        return a.at[:n].set(jnp.asarray(v, jnp.float32))

    p = p._replace(
        xyz=pad(p.xyz, np.stack([d["x"], d["y"], d["z"]], 1)),
        f_dc=pad(p.f_dc, f_dc),
        f_rest=pad(p.f_rest, f_rest),
        log_scale=pad(p.log_scale,
                      np.stack([d[f"scale_{i}"] for i in range(3)], 1)),
        quat=pad(p.quat, np.stack([d[f"rot_{i}"] for i in range(4)], 1)),
        logit_opacity=pad(p.logit_opacity, d["opacity"][:, None]),
    )
    if ch_sem:
        obj = np.stack([d[k] for k in obj_names], 1).reshape(
            n, ch_sem, 1).transpose(0, 2, 1)
        p = p._replace(obj_dc=pad(p.obj_dc, obj))

    zp = GM.zeros_params(capacity, max_sh_degree, ch_sem)
    return GM.GaussianState(
        params=p,
        adam=GM.AdamState(zp, zp, jnp.zeros((), jnp.int32)),
        active=jnp.zeros((capacity,), bool).at[:n].set(True),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=jnp.asarray(max_sh_degree, jnp.int32),
    )


def save_inside_ply(state: GM.GaussianState, path: str,
                    inside_mask: np.ndarray) -> None:
    """Subset PLY of gaussians inside the box, with shortest-axis normals in
    the normal slots (scene/gaussian_model.py:322-353)."""
    sub = state._replace(active=state.active & jnp.asarray(inside_mask))
    d = _compact(sub)
    normals = np.asarray(sub.shortest_axis_normal())[
        np.asarray(sub.active)]
    n = d["xyz"].shape[0]
    f_dc = d["f_dc"].transpose(0, 2, 1).reshape(n, _flat(d["f_dc"]))
    f_rest = d["f_rest"].transpose(0, 2, 1).reshape(n, _flat(d["f_rest"]))
    props: dict[str, np.ndarray] = {}
    for i, k in enumerate("xyz"):
        props[k] = d["xyz"][:, i].astype(np.float32)
    for i, k in enumerate(("nx", "ny", "nz")):
        props[k] = normals[:, i].astype(np.float32)
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
    props["opacity"] = d["logit_opacity"][:, 0].astype(np.float32)
    for i in range(3):
        props[f"scale_{i}"] = d["log_scale"][:, i].astype(np.float32)
    for i in range(4):
        props[f"rot_{i}"] = d["quat"][:, i].astype(np.float32)
    write_ply(path, props)


def save_splat(state: GM.GaussianState, path: str) -> None:
    """Web-viewer `.splat` export (antimatter15 format), the
    `cfg.train.save_splat` artifact (scene/__init__.py:116-117 — the
    reference declares the call but ships no implementation; this one is
    real). 32 bytes per gaussian: position f32x3, scale f32x3 (activated),
    rgba u8x4 (SH0 color + sigmoid opacity), quat u8x4 (normalized,
    [-1,1] -> [0,255]); sorted by descending volume*opacity importance the
    way the web viewers expect."""
    d = _compact(state)
    xyz = d["xyz"].astype(np.float32)
    scale = np.exp(d["log_scale"]).astype(np.float32)
    opacity = 1.0 / (1.0 + np.exp(-d["logit_opacity"][:, 0]))
    sh0 = d["f_dc"][:, 0, :]                               # (N, 3)
    rgb = np.clip(0.5 + 0.28209479177387814 * sh0, 0.0, 1.0)
    quat = d["quat"]
    quat = quat / np.maximum(np.linalg.norm(quat, axis=1, keepdims=True),
                             1e-12)
    order = np.argsort(-(scale.prod(axis=1) * opacity))
    n = xyz.shape[0]
    rec = np.zeros((n, 32), np.uint8)
    rec[:, 0:12] = xyz[order].view(np.uint8).reshape(n, 12)
    rec[:, 12:24] = scale[order].view(np.uint8).reshape(n, 12)
    rec[:, 24:27] = np.clip(rgb[order] * 255.0 + 0.5, 0, 255
                            ).astype(np.uint8)
    rec[:, 27] = np.clip(opacity[order] * 255.0 + 0.5, 0, 255
                         ).astype(np.uint8)
    rec[:, 28:32] = np.clip(quat[order] * 128.0 + 128.0, 0, 255
                            ).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def save_checkpoint(path: str, state: GM.GaussianState, iteration: int,
                    extra: dict | None = None) -> None:
    """Full resume checkpoint (params + Adam + stats + side networks)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {"iteration": np.asarray(iteration),
            "active_sh_degree": np.asarray(state.active_sh_degree),
            "active": np.asarray(state.active),
            "max_radii2d": np.asarray(state.max_radii2d),
            "grad_accum": np.asarray(state.grad_accum),
            "denom": np.asarray(state.denom),
            "adam_step": np.asarray(state.adam.step)}
    for k, v in state.params._asdict().items():
        flat[f"p_{k}"] = np.asarray(v)
        flat[f"mu_{k}"] = np.asarray(getattr(state.adam.mu, k))
        flat[f"nu_{k}"] = np.asarray(getattr(state.adam.nu, k))
    if extra:
        import pickle
        flat["extra"] = np.frombuffer(pickle.dumps(extra), np.uint8)
    np.savez(path, **flat)


def load_checkpoint(path: str) -> tuple[GM.GaussianState, int, dict]:
    z = np.load(path, allow_pickle=False)
    fields = GM.GaussianParams._fields
    params = GM.GaussianParams(*(jnp.asarray(z[f"p_{k}"]) for k in fields))
    mu = GM.GaussianParams(*(jnp.asarray(z[f"mu_{k}"]) for k in fields))
    nu = GM.GaussianParams(*(jnp.asarray(z[f"nu_{k}"]) for k in fields))
    state = GM.GaussianState(
        params=params,
        adam=GM.AdamState(mu, nu, jnp.asarray(z["adam_step"])),
        active=jnp.asarray(z["active"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        denom=jnp.asarray(z["denom"]),
        active_sh_degree=jnp.asarray(z["active_sh_degree"]),
    )
    extra = {}
    if "extra" in z:
        import pickle
        extra = pickle.loads(z["extra"].tobytes())
    return state, int(z["iteration"]), extra
