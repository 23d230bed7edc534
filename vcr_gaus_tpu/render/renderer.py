"""High-level differentiable renderer over the Pallas rasterization stack.

The TPU equivalent of the reference's `render()` facade
(gaussian_renderer/__init__.py:22-164): activations -> SH->RGB ->
shortest-axis normals flipped along the view -> EWA projection -> tile
binning -> Pallas compositing -> channel post-processing (normalized normal,
depth mask, depth->normal estimate, depth_var/distortion from moments,
semantic logits via the 1x1-classifier).

The four reference render variants collapse here:
  render / render_fast -> `render(...)` (channels gated by RenderConfig),
  count_render / visi_render / visi_acc_render (f_count=1/2/3) ->
  `render_stats(...)` returning per-Gaussian (count, importance).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..data.cameras import CameraArrays
from ..models.gaussians import GaussianState
from ..ops import binning as B
from ..ops import projection as PF
from ..ops import rasterize as R
from ..utils import graphics as G
from ..utils import sh as SH


class RenderConfig(NamedTuple):
    """Static render knobs (resolved at trace time)."""
    width: int
    height: int
    ch_sem: int = 0                 # semantic feature channels (0 = off)
    depth_mode: str = "intersection"  # 'traditional' | 'intersection'
                                      # (cfg.model.depth_type, reconstruct.yaml:10)
    entry_budget: int = 1 << 21
    scale_modifier: float = 1.0
    mask_depth_thr: float = 0.8     # cfg.optim.mask_depth_thr
    return_normal: bool = True
    max_sh_degree: int = 3


def render(
    state: GaussianState,
    cam: CameraArrays,
    cfg: RenderConfig,
    bg_color: jnp.ndarray,                 # (3,)
    sh_degree: int,                        # active SH degree (static)
    scene_extent: float | jnp.ndarray = 1.0,
    classifier=None,                       # callable (C,H,W)->(num_cls,H,W)
    override_color: jnp.ndarray | None = None,
    densify_dummy: jnp.ndarray | None = None,  # (C,2) zeros; pass it in and
                                               # differentiate w.r.t. it to
                                               # collect |d mean2d| stats
    bin_aux: R.BinAux | None = None,           # precomputed binning for THIS
                                               # (state, cam) — see
                                               # compute_camera_binning
) -> dict[str, Any]:
    """Returns the reference's output dict (gaussian_renderer/__init__.py:139-147):
    render (3,H,W), depth (H,W), normal (H,W,3), est_normal (H,W,3),
    alpha (H,W), mask (H,W) bool, radii (C,), visibility_filter (C,),
    densify_dummy (C,2) [differentiate w.r.t. it for |d mean2d| stats],
    plus render_sem / depth_var / distortion when enabled."""
    p = state.params
    xyz = p.xyz
    scales = state.scaling
    quats = p.quat
    opacity = state.opacity[:, 0]
    act = state.active

    proj = PF.project_gaussians(
        xyz, scales, quats, cam.viewmatrix, cam.projmatrix,
        cam.tanfov[0], cam.tanfov[1], cfg.width, cfg.height,
        cfg.scale_modifier, opacity=opacity)
    radius = jnp.where(act, proj.radius, 0)

    # SH -> RGB along per-Gaussian view dirs (convert_SHs_python oracle path,
    # gaussian_renderer/__init__.py:82-88; the fused CUDA path is identical
    # math inside forward.cu)
    if override_color is None:
        feats_sh = jnp.concatenate([p.f_dc, p.f_rest], axis=1)  # (C,K+1,3)
        shs = jnp.swapaxes(feats_sh, 1, 2)                      # (C,3,K+1)
        from ..utils.math import safe_normalize
        dir_pp = safe_normalize(xyz - cam.cam_center[None])
        rgb = jnp.maximum(SH.eval_sh(sh_degree, shs, dir_pp) + 0.5, 0.0)
    else:
        rgb = override_color

    # shortest-axis normal, flipped along the view dir then to camera space
    # (gaussian_renderer/__init__.py:93-101)
    normal_cam = None
    if cfg.return_normal:
        normal = state.shortest_axis_normal()
        view_dir = xyz - cam.cam_center[None]
        sign = jnp.where(jnp.sum(view_dir * normal, -1) > 0, 1.0, -1.0)
        normal = normal * sign[:, None]
        normal_cam = normal @ cam.viewmatrix[:3, :3]

    sem = p.obj_dc[:, 0, :] if cfg.ch_sem else None
    feats = PF.pack_features(proj, opacity, rgb, normal_cam, sem, cfg.ch_sem)

    cam_vec = jnp.concatenate([cam.intr, bg_color, jnp.zeros((1,))]
                              ).astype(jnp.float32)
    dummy = (densify_dummy if densify_dummy is not None
             else jnp.zeros((xyz.shape[0], 2), jnp.float32))
    img, binn = R.rasterize_image(feats, dummy, proj.mean2d, radius,
                                  proj.depth_z, cam_vec, cfg.width,
                                  cfg.height, cfg.ch_sem, cfg.depth_mode,
                                  cfg.entry_budget, bin_aux=bin_aux,
                                  extents=proj.ext)

    rendered = img[0:3]
    nrm = img[3:6]
    wd_sum = img[6]
    wd2_sum = img[7]
    alpha = img[8]
    depth = wd_sum                      # alpha-weighted depth (fork semantics)

    # post-kernel channel processing (gaussian_renderer/__init__.py:122-137).
    # The combined mask = camera foreground mask AND depth-threshold mask
    # (gaussian_renderer/__init__.py:125-131): semantic labels >0 are
    # foreground (BACKGROUND=0, tools/semantic_id.py); a camera without a
    # loaded mask (has_mask False) counts as all-foreground, and a
    # non-positive mask_depth_thr disables the depth cut (reference gates on
    # cfg.optim.mask_depth_thr > 0).
    from ..utils.math import safe_normalize as _sn
    if cfg.mask_depth_thr > 0:
        mask = depth < scene_extent * cfg.mask_depth_thr
    else:
        mask = jnp.ones(depth.shape, bool)
    fg = jnp.logical_or(jnp.logical_not(cam.has_mask), cam.mask > 0)
    mask = jnp.logical_and(mask, fg)
    nrm_hw3 = _sn(jnp.moveaxis(nrm, 0, -1))
    K = jnp.asarray([[cam.intr[0], 0, cam.intr[2]],
                     [0, cam.intr[1], cam.intr[3]],
                     [0, 0, 1]])
    est_normal = G.compute_normals_from_depth(depth, K)

    out = {
        "render": rendered,
        "depth": depth,
        "normal": nrm_hw3,
        "est_normal": est_normal,
        "alpha": alpha,
        "mask": jax.lax.stop_gradient(mask),
        "radii": radius,
        "visibility_filter": radius > 0,
        "densify_dummy": dummy,
        "overflow": binn.overflow,
        "num_entries": binn.num_entries,
    }
    if cfg.ch_sem:
        sem_feat = img[9:9 + cfg.ch_sem]
        if classifier is not None:
            out["render_sem"] = classifier(sem_feat)      # (num_cls, H, W)
        else:
            out["render_sem"] = sem_feat
    # depth_var / distortion from the moment channels (the fork's extra
    # NUM_DIST channels, gaussian_renderer/__init__.py:154-162)
    from ..train import losses as L
    out["depth_var"] = L.depth_var_from_moments(alpha, wd_sum, wd2_sum)
    out["distortion"] = L.distortion_from_moments(alpha, wd_sum, wd2_sum)
    return out


def compute_camera_binning(state: GaussianState, cam: CameraArrays,
                           cfg: RenderConfig) -> R.BinAux:
    """Binning lookahead: the tile binning (and the backward's grouping
    permutation) for (state, cam). Depends only on geometry (xyz, scales,
    quats, active) — opacity resets and SH warmup do NOT invalidate it; any
    densify/prune/capacity/budget change does. Computing it at the END of
    the previous step's program keeps every sort->gather pair across an XLA
    dispatch boundary (see ops/rasterize.BinAux)."""
    p = state.params
    proj = PF.project_gaussians(
        p.xyz, state.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
        cam.tanfov[0], cam.tanfov[1], cfg.width, cfg.height,
        cfg.scale_modifier, opacity=state.opacity[:, 0])
    radius = jnp.where(state.active, proj.radius, 0)
    return R.compute_bin_aux(proj.mean2d, radius, proj.depth_z, cfg.width,
                             cfg.height, cfg.entry_budget, extents=proj.ext)


def render_stats(state: GaussianState, cam: CameraArrays, cfg: RenderConfig,
                 bg_color: jnp.ndarray):
    """Per-Gaussian (pixel hit count, blending-weight importance) — the
    f_count modes (count_render :250-355 / visi_acc_render :467-571)."""
    p = state.params
    proj = PF.project_gaussians(
        p.xyz, state.scaling, p.quat, cam.viewmatrix, cam.projmatrix,
        cam.tanfov[0], cam.tanfov[1], cfg.width, cfg.height,
        cfg.scale_modifier, opacity=state.opacity[:, 0])
    radius = jnp.where(state.active, proj.radius, 0)
    rgb = jnp.zeros((p.xyz.shape[0], 3), jnp.float32)
    feats = PF.pack_features(proj, state.opacity[:, 0], rgb, None, None, 0)
    cam_vec = jnp.concatenate([cam.intr, bg_color, jnp.zeros((1,))]
                              ).astype(jnp.float32)
    count, imp = R.rasterize_entry_stats(
        feats, proj.mean2d, radius, proj.depth_z, cam_vec, cfg.width,
        cfg.height, 0, cfg.entry_budget, extents=proj.ext)
    return count, imp
