"""Box camera sampling + visibility-gated densification path."""

import jax.numpy as jnp
import numpy as np

from vcr_gaus_tpu.data.box_cameras import (find_axis, look_at_w2c,
                                           sample_box_cameras)


def test_look_at_forward_is_plus_z():
    pos = np.array([3.0, 1.0, 2.0])
    tgt = np.zeros(3)
    R = look_at_w2c(pos, tgt)
    # orthonormal
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    # target is in front of camera (+z), centered
    pc = R @ (tgt - pos)
    assert pc[2] > 0
    np.testing.assert_allclose(pc[:2], 0, atol=1e-9)


def test_find_axis_identity():
    axis, sign = find_axis(np.eye(3), "up")
    assert axis == 1 and sign == -1.0


def test_sampled_cameras_see_the_scene():
    trans = np.zeros(3, np.float32)
    scale = np.ones(3, np.float32) * 2.0
    cams = sample_box_cameras(24, trans, scale, up=True, around=True,
                              sample_mode="grid", size=64)
    assert len(cams) >= 16
    for cam in cams:
        # camera position on the box surface
        p = np.abs(cam.cam_center / 2.0)
        assert np.isclose(p.max(), 1.0, atol=0.15)
        # the origin projects in front of the camera
        hom = np.array([0, 0, 0, 1.0]) @ cam.viewmatrix
        assert hom[2] > 0


def test_visibility_stats_through_box_cams():
    from vcr_gaus_tpu.models import gaussians as GM
    from vcr_gaus_tpu.render.renderer import RenderConfig, render_stats
    rng = np.random.default_rng(0)
    n = 50
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = GM.create_from_pcd(pts, cols, 64, sh_degree=0)
    # inflate scales so splats are visible from the box surface
    state = state._replace(params=state.params._replace(
        log_scale=jnp.full((64, 3), np.log(0.05))))
    cams = sample_box_cameras(8, np.zeros(3), np.ones(3), up=True,
                              around=True, size=64)
    rcfg = RenderConfig(width=64, height=64, entry_budget=1 << 13,
                        depth_mode="traditional")
    count = jnp.zeros((64,))
    for cam in cams:
        c, _ = render_stats(state, cam, rcfg, jnp.zeros(3))
        count = count + c
    visi = np.asarray(count > 0)
    assert visi[:n].mean() > 0.9          # nearly all splats seen
    assert not visi[n:].any()             # padding invisible
