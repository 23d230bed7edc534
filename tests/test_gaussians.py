"""Fixed-capacity Gaussian population: init, Adam, densify/prune edits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_gaus_tpu.models import gaussians as GM


def make_state(n=20, cap=64, sh_degree=3, ch_sem=0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return GM.create_from_pcd(pts, cols, cap, sh_degree, ch_sem), pts, cols


def test_create_from_pcd():
    st, pts, cols = make_state()
    assert int(st.num_active) == 20
    np.testing.assert_allclose(np.asarray(st.params.xyz[:20]), pts, atol=1e-6)
    # opacity activation: sigmoid(logit) == 0.1
    np.testing.assert_allclose(np.asarray(st.opacity[:20, 0]), 0.1, atol=1e-5)
    # identity quats -> unit normals along one axis
    R = np.asarray(st.rotation[:20])
    np.testing.assert_allclose(np.linalg.norm(R, axis=-1), 1.0, atol=1e-6)
    # inactive slots are zero
    assert float(jnp.abs(st.params.xyz[20:]).max()) == 0.0


def test_adam_step_moves_active_only():
    st, _, _ = make_state()
    g = GM.zeros_params(64, 3, 0)
    g = g._replace(xyz=jnp.ones((64, 3)))
    g = GM.mask_grads(g, st.active)
    lrs = GM.LearningRates(xyz=jnp.asarray(0.01), f_dc=0.0025, f_rest=1e-4,
                           opacity=0.05, scaling=0.005, rotation=0.001,
                           obj_dc=0.0025)
    st2 = GM.adam_step(st, g, lrs)
    moved = np.asarray(jnp.abs(st2.params.xyz - st.params.xyz).sum(-1))
    assert np.all(moved[:20] > 0)
    assert np.all(moved[20:] == 0)
    # first-step Adam with constant grad ~= lr * sign(g)
    np.testing.assert_allclose(moved[:20], 3 * 0.01, rtol=1e-5)


def test_prune_zeroes_and_frees():
    st, _, _ = make_state()
    mask = jnp.zeros((64,), bool).at[5].set(True).at[7].set(True)
    st2 = GM.prune(st, mask)
    assert int(st2.num_active) == 18
    assert float(jnp.abs(st2.params.xyz[5]).sum()) == 0.0
    assert not bool(st2.active[7])


def test_clone_copies_into_free_slots():
    st, pts, _ = make_state()
    grads = jnp.zeros((64,)).at[3].set(1.0).at[11].set(1.0)
    st2, dropped = GM.densify_and_clone(st, grads, grad_threshold=0.5,
                                        percent_dense=0.01,
                                        scene_extent=1e9)  # all "small"
    assert int(dropped) == 0
    assert int(st2.num_active) == 22
    new_xyz = np.asarray(st2.params.xyz[20:22])
    expect = pts[[3, 11]]
    # the two clones land in the first free slots, order preserved
    np.testing.assert_allclose(np.sort(new_xyz, 0), np.sort(expect, 0),
                               atol=1e-6)


def test_clone_overflow_drops():
    st, _, _ = make_state(n=60, cap=64)
    grads = jnp.ones((64,))
    st2, dropped = GM.densify_and_clone(st, grads, 0.5, 0.01, 1e9)
    assert int(st2.num_active) == 64
    assert int(dropped) == 56


def test_split_along_max_axis():
    st, pts, _ = make_state()
    # make gaussian 0 anisotropic with known longest axis z
    ls = st.params.log_scale.at[0].set(jnp.log(jnp.asarray([0.1, 0.1, 0.9])))
    st = st._replace(params=st.params._replace(log_scale=ls))
    grads = jnp.zeros((64,)).at[0].set(1.0)
    st2, dropped = GM.densify_and_split_along_maxscaling(
        st, grads, 0.5, percent_dense=0.0001, scene_extent=1.0)
    assert int(dropped) == 0
    assert int(st2.num_active) == 21          # parent replaced + 1 child
    # identity quat -> longest axis dir is +z; children at xyz +- 2/3*0.9
    c1 = np.asarray(st2.params.xyz[0])
    c2 = np.asarray(st2.params.xyz[20])
    np.testing.assert_allclose(c1 - pts[0], [0, 0, 2 * 0.9 / 3], atol=1e-5)
    np.testing.assert_allclose(c2 - pts[0], [0, 0, -2 * 0.9 / 3], atol=1e-5)
    # split axis scale divided by 1.6, other axes kept
    s1 = np.asarray(jnp.exp(st2.params.log_scale[0]))
    np.testing.assert_allclose(s1, [0.1, 0.1, 0.9 / 1.6], rtol=1e-5)
    s2 = np.asarray(jnp.exp(st2.params.log_scale[20]))
    np.testing.assert_allclose(s2, s1, rtol=1e-5)


def test_reset_opacity():
    st, _, _ = make_state()
    mu = st.adam.mu._replace(logit_opacity=jnp.ones((64, 1)))
    st = st._replace(adam=st.adam._replace(mu=mu))
    st2 = GM.reset_opacity(st)
    np.testing.assert_allclose(np.asarray(st2.opacity[:20, 0]), 0.01,
                               atol=1e-5)
    assert float(jnp.abs(st2.adam.mu.logit_opacity).max()) == 0.0


def test_prune_by_importance_percentile():
    st, _, _ = make_state()
    imp = jnp.arange(64, dtype=jnp.float32)     # active slots 0..19
    st2 = GM.prune_by_importance(st, imp, percent=0.5)
    # positional k-lowest: k = int(.5*19) = 9 pruned -> 11 left
    assert int(st2.num_active) == 11
    assert not bool(st2.active[0])
    assert bool(st2.active[19])


def test_prune_by_importance_all_tied_scores():
    """Degenerate all-equal importance (e.g. a dead population) must still
    prune only ~percent, never everything: the reference drops the k lowest
    INDICES (tools/prune.py), and a threshold comparison would wipe 100% on
    ties — the on-chip schedule rehearsal hit exactly that as an empty
    model at save time."""
    st, _, _ = make_state()
    imp = jnp.zeros((64,), jnp.float32)
    st2 = GM.prune_by_importance(st, imp, percent=0.5)
    assert int(st2.num_active) == 11            # 20 active - k(9)
    # and ties break by slot index: the lowest slots go first
    assert not bool(st2.active[0]) and bool(st2.active[19])


def test_add_densification_stats():
    st, _, _ = make_state()
    g = jnp.ones((64, 2))
    radii = jnp.full((64,), 7, jnp.int32)
    vis = jnp.zeros((64,), bool).at[2].set(True)
    st2 = GM.add_densification_stats(st, g, radii, vis)
    assert float(st2.grad_accum[2]) == pytest.approx(np.sqrt(2), rel=1e-5)
    assert float(st2.denom[2]) == 1.0
    assert float(st2.max_radii2d[2]) == 7.0
    assert float(st2.grad_accum[3]) == 0.0


def test_densify_and_prune_full_cycle_jits():
    st, _, _ = make_state()
    st = st._replace(grad_accum=jnp.full((64,), 1.0),
                     denom=jnp.ones((64,)))

    @jax.jit
    def step(s):
        return GM.densify_and_prune(s, grad_threshold=2.0, min_opacity=0.005,
                                    scene_extent=100.0, max_screen_size=20,
                                    percent_dense=0.01)

    st2, dropped = step(st)
    assert int(st2.num_active) == 20   # no grads above threshold, op=0.1 kept


def test_v_imp_score_monotonic_in_volume():
    st, _, _ = make_state()
    imp = jnp.ones((64,))
    v = GM.v_imp_score(st, imp, v_pow=0.1)
    assert np.isfinite(np.asarray(v[:20])).all()


def test_knn_exact_small_n():
    from vcr_gaus_tpu.ops import knn as KNN
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    d2 = np.asarray(KNN.knn_sq_dists(jnp.asarray(pts), k=3))
    D = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    bf = np.sort(D, axis=1)[:, :3]
    np.testing.assert_allclose(d2, bf, rtol=1e-3, atol=1e-5)
    # distCUDA2 semantics
    md = np.asarray(KNN.mean_sq_dist_to_3nn(jnp.asarray(pts)))
    assert md.shape == (500,) and (md > 0).all()


def test_knn_morton_large_n():
    from vcr_gaus_tpu.ops import knn as KNN
    rng = np.random.default_rng(2)
    # surface-like cloud (locality structure matches real init pcds)
    theta = rng.uniform(0, 2 * np.pi, 12000)
    z = rng.uniform(-1, 1, 12000)
    r = np.sqrt(1 - z ** 2)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], 1)
    pts += rng.normal(0, 0.01, pts.shape)
    pts = pts.astype(np.float32)
    d2 = np.asarray(KNN.knn_sq_dists(jnp.asarray(pts), k=3, window=64,
                                     block=2048))
    D = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    bf = np.sort(D, axis=1)[:, :3]
    exact = np.isclose(d2, bf, rtol=1e-4).all(1).mean()
    assert exact > 0.9, exact
    # the scale-init consumer uses the mean — demand small relative error
    rel = np.abs(d2.mean(1) - bf.mean(1)) / bf.mean(1)
    assert np.median(rel) < 0.05


def test_radius_outlier_removal():
    from vcr_gaus_tpu.ops import knn as KNN
    rng = np.random.default_rng(1)
    cluster = rng.normal(0, 0.01, (200, 3)).astype(np.float32)
    outliers = rng.normal(0, 5.0, (5, 3)).astype(np.float32) + 10
    pts = jnp.asarray(np.concatenate([cluster, outliers]))
    keep = np.asarray(KNN.remove_radius_outlier(pts, nb_points=5, radius=0.1))
    assert keep[:200].mean() > 0.95
    assert not keep[200:].any()
