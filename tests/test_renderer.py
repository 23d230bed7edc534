"""High-level render() facade over a synthetic scene + appearance/classifier."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_gaus_tpu.data.cameras import Camera
from vcr_gaus_tpu.models import gaussians as GM
from vcr_gaus_tpu.render import RenderConfig, render
from vcr_gaus_tpu.render.renderer import render_stats

W, H = 64, 48


def make_scene(n=200, cap=256, seed=0, ch_sem=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, cap, sh_degree=3, ch_sem=ch_sem)
    cam = Camera(colmap_id=0, idx=0, image_name="synt",
                 R=np.eye(3), T=np.zeros(3), fovx=0.9, fovy=0.7,
                 width=W, height=H,
                 image=rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    return state, cam


def test_render_outputs():
    state, cam = make_scene()
    cfg = RenderConfig(width=W, height=H, entry_budget=1 << 14,
                       depth_mode="traditional")
    out = render(state, cam.arrays(), cfg, jnp.zeros(3), sh_degree=0,
                 scene_extent=100.0)
    assert out["render"].shape == (3, H, W)
    assert out["depth"].shape == (H, W)
    assert out["normal"].shape == (H, W, 3)
    assert out["est_normal"].shape == (H, W, 3)
    assert not bool(out["overflow"])
    assert float(out["alpha"].max()) > 0.1
    assert np.isfinite(np.asarray(out["render"])).all()
    # DC-only sh: rendered color should correlate with input colors' mean
    assert 0.0 < float(out["render"].mean()) < 1.0
    # visibility: most gaussians project into the image
    assert int(out["visibility_filter"].sum()) > 100
    # depth in the scene range where alpha is solid
    d = np.asarray(out["depth"])
    a = np.asarray(out["alpha"])
    assert 2.0 < d[a > 0.6].mean() / a[a > 0.6].mean() < 7.0


def test_render_intersection_depth_and_grads():
    state, cam = make_scene(seed=1)
    cfg = RenderConfig(width=W, height=H, entry_budget=1 << 14,
                       depth_mode="intersection")
    target = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (3, H, W)).astype(np.float32))

    def loss(params, dummy):
        st = state._replace(params=params)
        out = render(st, cam.arrays(), cfg, jnp.zeros(3), sh_degree=1,
                     scene_extent=100.0, densify_dummy=dummy)
        return jnp.mean(jnp.abs(out["render"] - target)) + out["depth"].mean()

    dummy = jnp.zeros((state.capacity, 2))
    g_params, g_dummy = jax.grad(loss, argnums=(0, 1))(state.params, dummy)
    for name, g in zip(g_params._fields, g_params):
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
    assert float(jnp.abs(g_params.xyz).max()) > 0
    assert float(jnp.abs(g_params.quat).max()) > 0   # via normals/intersection
    assert float(g_dummy.sum()) > 0                  # densify stats flow
    # inactive slots receive no gradient
    assert float(jnp.abs(np.asarray(g_params.xyz)[200:]).max()) == 0


def test_render_semantic_channels():
    state, cam = make_scene(ch_sem=4)
    from vcr_gaus_tpu.models.appearance import SemanticClassifier
    clf = SemanticClassifier(num_cls=2)
    params = clf.init(jax.random.PRNGKey(0), jnp.zeros((4, H, W)))
    cfg = RenderConfig(width=W, height=H, ch_sem=4, entry_budget=1 << 14,
                       depth_mode="traditional")
    out = render(state, cam.arrays(), cfg, jnp.zeros(3), sh_degree=0,
                 scene_extent=100.0,
                 classifier=lambda f: clf.apply(params, f))
    assert out["render_sem"].shape == (2, H, W)
    assert np.isfinite(np.asarray(out["render_sem"])).all()


def test_render_stats_importance():
    state, cam = make_scene()
    cfg = RenderConfig(width=W, height=H, entry_budget=1 << 14,
                       depth_mode="traditional")
    count, imp = render_stats(state, cam.arrays(), cfg, jnp.zeros(3))
    assert count.shape == (256,)
    assert float(imp[:200].sum()) > 0
    assert float(imp[200:].sum()) == 0.0   # inactive slots


def test_appearance_network_shapes():
    from vcr_gaus_tpu.models.appearance import (appearance_transform,
                                                init_appearance)
    rng = jax.random.PRNGKey(0)
    h, w = 96, 128
    emb, params = init_appearance(rng, num_images=5, height=h, width=w)
    assert emb.shape == (5, 64)
    img = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (3, h, w)).astype(np.float32))
    transformed, (top, left, ch, cw) = appearance_transform(
        params, emb, img, view_idx=2)
    assert transformed.shape == (3, ch, cw)
    assert (ch, cw) == (96, 128)
    # map is multiplicative in (0,1): output <= input
    assert float((transformed - img[:, top:top+ch, left:left+cw]).max()) <= 1e-6
    assert np.isfinite(np.asarray(transformed)).all()


def test_pixel_shuffle_matches_torch():
    import torch
    from vcr_gaus_tpu.models.appearance import pixel_shuffle
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 16, 6, 8)).astype(np.float32)  # NCHW
    t = torch.pixel_shuffle(torch.tensor(x), 2)[0].numpy()  # (4, 12, 16)
    ours = np.asarray(pixel_shuffle(
        jnp.asarray(x[0].transpose(1, 2, 0)), 2))           # HWC
    np.testing.assert_allclose(ours.transpose(2, 0, 1), t, atol=1e-6)


def test_bilinear_resize_matches_torch():
    import torch
    import torch.nn.functional as F
    from vcr_gaus_tpu.models.appearance import bilinear_resize
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 7, 9)).astype(np.float32)
    t = F.interpolate(torch.tensor(x)[None], size=(14, 18), mode="bilinear",
                      align_corners=True)[0].numpy()
    ours = np.asarray(bilinear_resize(jnp.asarray(x.transpose(1, 2, 0)),
                                      14, 18)).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, t, atol=1e-5)


def test_camera_mask_intersects_render_mask():
    """out['mask'] = camera foreground mask AND depth-threshold mask
    (gaussian_renderer/__init__.py:125-131); thr<=0 disables the depth cut;
    no camera mask -> depth threshold only."""
    import dataclasses

    state, cam = make_scene(seed=7)
    m = np.zeros((H, W), np.int32)
    m[:, W // 2:] = 1          # right half foreground
    cam_m = dataclasses.replace(cam, mask=m)
    cfg = RenderConfig(width=W, height=H, entry_budget=1 << 14,
                       depth_mode="traditional", mask_depth_thr=0.8)

    out = render(state, cam_m.arrays(), cfg, jnp.zeros(3), sh_degree=0,
                 scene_extent=100.0)
    got = np.asarray(out["mask"])
    assert not got[:, :W // 2].any()          # background excluded
    assert got[:, W // 2:].any()              # some foreground survives

    # thr <= 0: the mask is exactly the camera foreground mask
    out0 = render(state, cam_m.arrays(), cfg._replace(mask_depth_thr=0.0),
                  jnp.zeros(3), sh_degree=0, scene_extent=100.0)
    np.testing.assert_array_equal(np.asarray(out0["mask"]), m > 0)

    # no camera mask: depth-threshold only (round-2 behavior preserved)
    out_nm = render(state, cam.arrays(), cfg, jnp.zeros(3), sh_degree=0,
                    scene_extent=100.0)
    depth = np.asarray(out_nm["depth"])
    np.testing.assert_array_equal(np.asarray(out_nm["mask"]),
                                  depth < 100.0 * 0.8)


def test_masked_pixels_zero_dnormal_curv_grad():
    """With an all-background camera mask the D-Normal and curvature losses
    are zero AND contribute zero gradient (the reference indexes est_normal
    by the combined mask, trainer.py:270-287)."""
    import dataclasses

    from vcr_gaus_tpu.train import losses as L

    state, cam = make_scene(seed=8)
    cam_bg = dataclasses.replace(
        cam, mask=np.zeros((H, W), np.int32),
        normal=np.tile(np.array([0, 0, -1], np.float32)[:, None, None],
                       (1, H, W)))
    arrs = cam_bg.arrays()
    cfg = RenderConfig(width=W, height=H, entry_budget=1 << 14,
                       depth_mode="traditional", mask_depth_thr=0.8)

    def dnormal_plus_curv(params):
        st = state._replace(params=params)
        out = render(st, arrs, cfg, jnp.zeros(3), sh_degree=0,
                     scene_extent=100.0)
        gt_n = jnp.moveaxis(arrs.normal, 0, -1)
        w = L.cos_weight(jax.lax.stop_gradient(out["normal"]), gt_n, 0.01)
        dn = L.masked_monosdf_normal_loss(out["est_normal"], gt_n,
                                          out["mask"], w)
        curv = L.normal2curv(out["est_normal"],
                             out["mask"][..., None].astype(jnp.float32))
        return dn + jnp.abs(curv).mean()

    val, g = jax.value_and_grad(dnormal_plus_curv)(state.params)
    assert float(val) == 0.0
    for name, arr in zip(g._fields, g):
        if arr.size:
            assert float(jnp.abs(arr).max()) == 0.0, name


def test_render_with_precomputed_binning_matches():
    """The binning-lookahead path (bin_aux from compute_camera_binning) must
    reproduce the in-program-binning render and its gradients exactly."""
    from vcr_gaus_tpu.render.renderer import compute_camera_binning

    state, cam = make_scene(n=150, seed=3)
    arrs = cam.arrays()
    rcfg = RenderConfig(width=W, height=H, depth_mode="intersection",
                        entry_budget=1 << 13)
    bg = jnp.zeros(3)
    aux = compute_camera_binning(state, arrs, rcfg)

    out_a = render(state, arrs, rcfg, bg, sh_degree=2)
    out_b = render(state, arrs, rcfg, bg, sh_degree=2, bin_aux=aux)
    for k in ("render", "depth", "normal", "alpha"):
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]), err_msg=k)

    def loss(params, use_aux):
        st = state._replace(params=params)
        out = render(st, arrs, rcfg, bg, sh_degree=2,
                     bin_aux=aux if use_aux else None)
        return (out["render"].sum() + out["depth"].sum()
                + out["normal"].sum())

    g_a = jax.grad(lambda p: loss(p, False))(state.params)
    g_b = jax.grad(lambda p: loss(p, True))(state.params)
    for name, a, b in zip(g_a._fields, g_a, g_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   rtol=1e-5, err_msg=name)
