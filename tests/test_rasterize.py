"""Pallas rasterizer vs pure-JAX oracle + finite-difference gradient checks.

Runs on CPU (interpret mode) over tiny random scenes, per the test strategy
derived from the reference (SURVEY.md §4): the CUDA fork has no tests; the
rebuilt kernels make unit testing mandatory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_gaus_tpu.ops import binning as B
from vcr_gaus_tpu.ops import projection as PF
from vcr_gaus_tpu.ops import rasterize as R
from vcr_gaus_tpu.ops import rasterize_tpu as K
from vcr_gaus_tpu.ops import rasterize_ref as REF

W, H = 40, 24          # non-multiples of TILE on purpose
CH_SEM = 2


def make_scene(n=60, seed=0, ch_sem=CH_SEM):
    rng = np.random.default_rng(seed)
    mean2d = rng.uniform([-4, -4], [W + 4, H + 4], size=(n, 2))
    # random SPD 2x2 covariances with moderate extent
    theta = rng.uniform(0, np.pi, n)
    s1 = rng.uniform(1.5, 6.0, n)
    s2 = rng.uniform(1.5, 6.0, n)
    c, s = np.cos(theta), np.sin(theta)
    # cov = R diag(s1^2,s2^2) R^T
    xx = c * c * s1**2 + s * s * s2**2
    xy = c * s * (s1**2 - s2**2)
    yy = s * s * s1**2 + c * c * s2**2
    det = xx * yy - xy * xy
    conic = np.stack([yy / det, -xy / det, xx / det], 1)
    opacity = rng.uniform(0.2, 0.95, n)
    depth = rng.uniform(1.0, 9.0, n)
    normal = rng.normal(size=(n, 3))
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    # keep plane normals facing the camera so intersection depth is stable
    normal[:, 2] = -np.abs(normal[:, 2]) - 0.3
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3))
    sem = rng.uniform(0, 1, (n, ch_sem))
    mean_cam = np.stack([rng.normal(size=n), rng.normal(size=n), depth], 1)

    feats = np.zeros((n, PF.feature_dim(ch_sem)), np.float32)
    feats[:, PF.F_MEAN_X] = mean2d[:, 0]
    feats[:, PF.F_MEAN_Y] = mean2d[:, 1]
    feats[:, PF.F_CONIC_A:PF.F_CONIC_C + 1] = conic
    feats[:, PF.F_OPACITY] = opacity
    feats[:, PF.F_DEPTH_Z] = depth
    feats[:, PF.F_PLANE_D] = np.sum(normal * mean_cam, axis=1)
    feats[:, PF.F_NORMAL:PF.F_NORMAL + 3] = normal
    feats[:, PF.F_RGB:PF.F_RGB + 3] = rgb
    if ch_sem:
        feats[:, PF.F_SEM:PF.F_SEM + ch_sem] = sem

    # radius must cover every pixel with alpha >= ALPHA_EPS (power >= ln(eps)
    # at op<=0.95 needs ~3.32 sigma) so the tile-rect culling loses nothing
    # relative to the all-pixels oracle.
    radius = np.ceil(3.5 * np.maximum(s1, s2)).astype(np.int32)
    radius[rng.uniform(size=n) < 0.1] = 0      # some culled
    cam = np.array([50.0, 50.0, W / 2, H / 2, 0.1, 0.5, 0.9, 0.0], np.float32)
    return jnp.asarray(feats), jnp.asarray(radius), cam


def run_both(feats, radius, cam, depth_mode, ch_sem=CH_SEM):
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    dummy = jnp.zeros((feats.shape[0], 2))
    out, binn = R.rasterize_image(feats, dummy, mean2d, radius, depth_z,
                                  jnp.asarray(cam), W, H, ch_sem, depth_mode,
                                  entry_budget=4096)
    assert not bool(binn.overflow)
    order = REF.depth_order(depth_z, radius)
    ref = REF.composite_reference(
        feats, order, H, W, jnp.asarray(cam[4:7]), ch_sem,
        depth_mode=depth_mode, cam_k=jnp.asarray(cam[:4]))
    return np.asarray(out), np.asarray(ref), binn


@pytest.mark.parametrize("depth_mode", ["traditional", "intersection"])
def test_forward_matches_oracle(depth_mode):
    feats, radius, cam = make_scene()
    out, ref, _ = run_both(feats, radius, cam, depth_mode)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_forward_empty_tiles_get_background():
    feats, radius, cam = make_scene()
    radius = jnp.zeros_like(radius)   # everything culled
    out, ref, _ = run_both(feats, radius, cam, "traditional")
    bg = np.broadcast_to(np.asarray(cam[4:7])[:, None, None], out[:3].shape)
    np.testing.assert_allclose(out[:3], bg, atol=1e-6)
    np.testing.assert_allclose(out[3:], 0.0, atol=1e-6)


@pytest.mark.parametrize("depth_mode", ["traditional", "intersection"])
def test_backward_matches_oracle_autodiff(depth_mode):
    feats, radius, cam = make_scene(n=40, seed=1)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    order = REF.depth_order(depth_z, radius)
    rng = np.random.default_rng(3)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def loss_pallas(f):
        # geometry fixed at the primal values (matches the custom-autograd
        # boundary: binning is non-differentiable)
        out, _ = R.rasterize_image(f, jnp.zeros((f.shape[0], 2)), mean2d,
                                   radius, depth_z, jnp.asarray(cam), W, H,
                                   CH_SEM, depth_mode, entry_budget=4096)
        return jnp.sum(out * g_img)

    def loss_ref(f):
        out = REF.composite_reference(
            f, order, H, W, jnp.asarray(cam[4:7]), CH_SEM,
            depth_mode=depth_mode, cam_k=jnp.asarray(cam[:4]))
        return jnp.sum(out * g_img)

    g_pallas = np.asarray(jax.grad(loss_pallas)(feats))
    g_ref = np.asarray(jax.grad(loss_ref)(feats))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_pallas, g_ref, atol=2e-3 * scale, rtol=2e-3)


def test_flattened_anisotropic_gaussians_fwd_bwd():
    """Sliver gaussians (2D conic condition number ~1e4) — the steady state
    of this model, whose flattening loss drives the smallest axis toward
    zero. Guards the kernel's alpha/gradient numerics in exactly the regime
    where a polynomial-expansion power evaluation loses ~kappa*eps digits
    (measured 8.5e-2 on-chip error before it was reverted) and where the
    backward's moment-matmul reconstruction sees its largest |mean - tile|
    amplification."""
    rng = np.random.default_rng(11)
    n = 40
    feats0, radius0, cam = make_scene(n=n, seed=11)
    f = np.asarray(feats0).copy()
    theta = rng.uniform(0, np.pi, n)
    s1 = rng.uniform(10.0, 30.0, n)          # long axis: spans many tiles
    s2 = rng.uniform(0.3, 0.6, n)            # short axis: subpixel-ish
    c, s = np.cos(theta), np.sin(theta)
    xx = c * c * s1**2 + s * s * s2**2
    xy = c * s * (s1**2 - s2**2)
    yy = s * s * s1**2 + c * c * s2**2
    det = xx * yy - xy * xy
    f[:, PF.F_CONIC_A] = yy / det
    f[:, PF.F_CONIC_B] = -xy / det
    f[:, PF.F_CONIC_C] = xx / det
    feats = jnp.asarray(f)
    radius = jnp.asarray(np.ceil(3.5 * s1).astype(np.int32))

    out, ref, _ = run_both(feats, radius, cam, "intersection")
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)

    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    order = REF.depth_order(depth_z, radius)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def loss_pallas(f):
        out, _ = R.rasterize_image(f, jnp.zeros((f.shape[0], 2)), mean2d,
                                   radius, depth_z, jnp.asarray(cam), W, H,
                                   CH_SEM, "intersection", entry_budget=8192)
        return jnp.sum(out * g_img)

    def loss_ref(f):
        out = REF.composite_reference(
            f, order, H, W, jnp.asarray(cam[4:7]), CH_SEM,
            depth_mode="intersection", cam_k=jnp.asarray(cam[:4]))
        return jnp.sum(out * g_img)

    g_pallas = np.asarray(jax.grad(loss_pallas)(feats))
    g_ref = np.asarray(jax.grad(loss_ref)(feats))
    # per-column scale: conic grads live on a vastly different scale than
    # rgb/opacity grads in this regime; a global max would hide errors
    scale = np.maximum(np.abs(g_ref).max(axis=0, keepdims=True), 1e-8)
    np.testing.assert_allclose(g_pallas / scale, g_ref / scale,
                               atol=5e-3, rtol=0)


def test_backward_clamped_denominator_no_grad_leak():
    """Near-tangent splat planes hit the |ray.normal| >= 1e-2 clamp; the
    backward must treat the clamped denominator as a constant (autodiff
    semantics) instead of leaking a 1/denom^2-amplified normal gradient
    (regression: spurious quat grads ~1e3x too large on such scenes)."""
    feats, radius, cam = make_scene(n=40, seed=7)
    # rotate normals near-perpendicular to the optical axis so many pixels
    # clamp: n = (nx, ny, eps) with |eps| tiny
    f = np.asarray(feats).copy()
    rng = np.random.default_rng(8)
    nxy = rng.normal(size=(f.shape[0], 2))
    nxy /= np.linalg.norm(nxy, axis=1, keepdims=True)
    f[:, PF.F_NORMAL:PF.F_NORMAL + 2] = nxy
    f[:, PF.F_NORMAL + 2] = rng.uniform(-5e-3, 5e-3, f.shape[0])
    depth = f[:, PF.F_DEPTH_Z]
    mean_cam = np.stack([rng.normal(size=f.shape[0]),
                         rng.normal(size=f.shape[0]), depth], 1)
    f[:, PF.F_PLANE_D] = np.sum(
        f[:, PF.F_NORMAL:PF.F_NORMAL + 3] * mean_cam, 1)
    feats = jnp.asarray(f)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    order = REF.depth_order(depth_z, radius)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def loss_pallas(f):
        out, _ = R.rasterize_image(f, jnp.zeros((f.shape[0], 2)), mean2d,
                                   radius, depth_z, jnp.asarray(cam), W, H,
                                   CH_SEM, "intersection", entry_budget=4096)
        return jnp.sum(out * g_img)

    def loss_ref(f):
        out = REF.composite_reference(
            f, order, H, W, jnp.asarray(cam[4:7]), CH_SEM,
            depth_mode="intersection", cam_k=jnp.asarray(cam[:4]))
        return jnp.sum(out * g_img)

    g_pallas = np.asarray(jax.grad(loss_pallas)(feats))
    g_ref = np.asarray(jax.grad(loss_ref)(feats))
    gn_p = g_pallas[:, PF.F_NORMAL:PF.F_NORMAL + 3]
    gn_r = g_ref[:, PF.F_NORMAL:PF.F_NORMAL + 3]
    scale = max(np.abs(gn_r).max(), 1e-6)
    np.testing.assert_allclose(gn_p, gn_r, atol=5e-3 * scale, rtol=5e-3)


def test_densify_dummy_grad_is_abs_accumulation():
    feats, radius, cam = make_scene(n=30, seed=2, ch_sem=0)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    rng = np.random.default_rng(4)
    g_img = jnp.asarray(rng.normal(size=(9, H, W)).astype(np.float32))

    def loss(f, dummy):
        out, _ = R.rasterize_image(f, dummy, mean2d, radius, depth_z,
                                   jnp.asarray(cam), W, H, 0, "traditional",
                                   entry_budget=4096)
        return jnp.sum(out * g_img)

    g_f, g_dummy = jax.grad(loss, argnums=(0, 1))(
        feats, jnp.zeros((feats.shape[0], 2)))
    g_dummy = np.asarray(g_dummy)
    g_mean = np.asarray(g_f[:, [PF.F_MEAN_X, PF.F_MEAN_Y]])
    # abs accumulation dominates the signed accumulation per Gaussian
    assert np.all(g_dummy + 1e-6 >= np.abs(g_mean) - 1e-4)
    assert g_dummy.sum() > 0


def test_entry_stats_match_oracle_weights():
    feats, radius, cam = make_scene(n=25, seed=5, ch_sem=0)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    count, imp = R.rasterize_entry_stats(feats, mean2d, radius, depth_z,
                                         jnp.asarray(cam), W, H, 0,
                                         entry_budget=4096)
    # oracle importance: total blending weight of each gaussian over pixels
    order = REF.depth_order(depth_z, radius)
    n = feats.shape[0]
    f = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], 0)[order]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dx = xs.reshape(-1, 1) - f[None, :, PF.F_MEAN_X]
    dy = ys.reshape(-1, 1) - f[None, :, PF.F_MEAN_Y]
    A, Bc, C = (f[:, PF.F_CONIC_A], f[:, PF.F_CONIC_B], f[:, PF.F_CONIC_C])
    power = -0.5 * (A[None] * dx * dx + C[None] * dy * dy) - Bc[None] * dx * dy
    alpha = f[None, :, PF.F_OPACITY] * jnp.exp(power)
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.where(alpha < REF.ALPHA_EPS, 0.0,
                      jnp.minimum(alpha, REF.ALPHA_CAP))
    one_minus = 1.0 - alpha
    cum = jnp.cumprod(one_minus, axis=1)
    trans_excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], 1)
    w = alpha * trans_excl
    imp_ref = np.zeros(n + 1)
    np.add.at(imp_ref, np.asarray(order), np.asarray(w.sum(0)))
    np.testing.assert_allclose(np.asarray(imp), imp_ref[:n], atol=1e-3,
                               rtol=1e-3)
    assert np.all(np.asarray(count) >= 0)


def test_cumsum_lanes_exact_and_matches_native():
    """Blockwise MXU cumsum must be EXACT for integer inputs (regression:
    the default matmul precision truncates inputs to bf16 — 393 -> 392 —
    which silently corrupted the binning offsets) and f32-accurate for
    float gradients."""
    rng = np.random.default_rng(0)
    for shape, dtype in [((458752,), np.int32), ((131070,), np.int32),
                         ((16, 458752), np.float32), ((5, 130), np.float32)]:
        if dtype == np.int32:
            x = rng.integers(0, 7, size=shape).astype(dtype)
            got = np.asarray(B.cumsum_lanes(jnp.asarray(x)))
            assert (np.cumsum(x, -1).astype(np.int64)
                    == got.astype(np.int64)).all()
        else:
            x = rng.normal(size=shape).astype(dtype)
            got = np.asarray(B.cumsum_lanes(jnp.asarray(x)))
            np.testing.assert_allclose(
                got, np.cumsum(x, -1, dtype=np.float64), rtol=1e-4,
                atol=5e-3)


def test_binning_exact_coverage():
    feats, radius, cam = make_scene(n=50, seed=6)
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    depth_z = feats[:, PF.F_DEPTH_Z]
    binn = B.bin_gaussians(mean2d, radius, depth_z, W, H, K.TILE, 4096)
    n_tx, n_ty = B.tile_grid(W, H, K.TILE)
    gid = np.asarray(binn.sorted_gid)
    starts = np.asarray(binn.tile_starts)
    counts = np.asarray(binn.tile_counts)
    assert np.all(starts % 128 == 0)           # Mosaic lane alignment
    # regions exactly partition the aligned array prefix
    assert np.all(starts[1:] == starts[:-1] + -(-counts[:-1] // 128) * 128)
    # padding slots are flagged invalid (gid == n)
    n_g = feats.shape[0]
    for t in range(n_tx * n_ty):
        pad_end = starts[t] + -(-counts[t] // 128) * 128
        assert np.all(gid[starts[t] + counts[t]:pad_end] == n_g)
    # per tile, the entry set matches the rect-overlap predicate
    m2d = np.asarray(mean2d)
    r = np.asarray(radius).astype(np.float64)
    for t in range(n_tx * n_ty):
        tx, ty = t % n_tx, t // n_tx
        got = set(gid[starts[t]:starts[t] + counts[t]].tolist())
        expect = set()
        for i in range(len(r)):
            if r[i] <= 0:
                continue
            x0 = min(max(int((m2d[i, 0] - r[i]) / K.TILE), 0), n_tx)
            y0 = min(max(int((m2d[i, 1] - r[i]) / K.TILE), 0), n_ty)
            x1 = min(max(int((m2d[i, 0] + r[i] + K.TILE - 1) / K.TILE), 0), n_tx)
            y1 = min(max(int((m2d[i, 1] + r[i] + K.TILE - 1) / K.TILE), 0), n_ty)
            if x0 <= tx < x1 and y0 <= ty < y1:
                expect.add(i)
        assert got == expect, f"tile {t}: {got ^ expect}"
        # front-to-back depth order within the tile
        d = np.asarray(depth_z)[gid[starts[t]:starts[t] + counts[t]]]
        assert np.all(np.diff(d) >= 0)


def test_entry_builder_grad_matches_scatter_even_truncated():
    """The scatter-free segment-sum backward of the entry builder must equal
    a direct scatter-add by sorted gid — including when the entry budget
    truncates the expansion (tail gaussians then simply receive the sums of
    their kept entries)."""
    feats, radius, cam = make_scene(n=80, seed=9, ch_sem=0)
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    depth_z = feats[:, PF.F_DEPTH_Z]
    n = feats.shape[0]
    rng = np.random.default_rng(3)

    for budget in (4096, 128):     # 128 forces truncation on this scene
        binn = B.bin_gaussians(mean2d, radius, depth_z, W, H, K.TILE, budget)
        build = R._make_entry_builder(W, H, budget)
        payload_t = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
        cot = jnp.asarray(
            rng.normal(size=(8, binn.sorted_gid.shape[0])).astype(np.float32))

        def f(p):
            entries_t, _ = build(p, mean2d, radius, depth_z, None)
            return jnp.vdot(entries_t, cot)

        got = np.asarray(jax.grad(f)(payload_t))
        want = np.asarray(
            jnp.zeros((8, n)).at[:, binn.sorted_gid].add(cot, mode="drop"))
        if budget == 128:
            assert bool(binn.overflow)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_early_termination_matches_oracle():
    """A saturated multi-chunk tile: fwd must early-terminate (hidden chunk
    count < nchunks) yet match the full-composite oracle within the CUDA
    fork's T<1e-4 termination error; grads of skipped entries are ~0."""
    n = 700
    rng = np.random.default_rng(7)
    ch_sem = 0
    # all gaussians piled on one tile with near-cap opacity
    feats = np.zeros((n, PF.feature_dim(ch_sem)), np.float32)
    feats[:, PF.F_MEAN_X] = rng.uniform(2, 14, n)
    feats[:, PF.F_MEAN_Y] = rng.uniform(2, 14, n)
    feats[:, PF.F_CONIC_A] = 0.02        # huge, flat splats cover the tile
    feats[:, PF.F_CONIC_C] = 0.02
    feats[:, PF.F_OPACITY] = 0.95
    depth = np.sort(rng.uniform(1.0, 9.0, n)).astype(np.float32)
    feats[:, PF.F_DEPTH_Z] = depth
    feats[:, PF.F_RGB:PF.F_RGB + 3] = rng.uniform(0, 1, (n, 3))
    nrm = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    feats[:, PF.F_NORMAL:PF.F_NORMAL + 3] = nrm
    feats[:, PF.F_PLANE_D] = -depth
    feats = jnp.asarray(feats)
    radius = jnp.full((n,), 30, jnp.int32)
    cam = np.array([50.0, 50.0, W / 2, H / 2, 0.1, 0.5, 0.9, 0.0],
                   np.float32)

    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    out, binn = R.rasterize_image(feats, jnp.zeros((n, 2)), mean2d, radius,
                                  depth_z, jnp.asarray(cam), W, H, ch_sem,
                                  "traditional", entry_budget=8192)
    assert not bool(binn.overflow)
    # at opacity .95 transmittance hits 1e-4 after ~4 entries: the dense
    # tiles must NOT composite all their chunks
    assert int(jnp.max(binn.tile_counts)) > K.G   # multi-chunk tile exists

    order = REF.depth_order(depth_z, radius)
    ref = REF.composite_reference(feats, order, H, W, jnp.asarray(cam[4:7]),
                                  ch_sem, depth_mode="traditional",
                                  cam_k=jnp.asarray(cam[:4]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)

    g_img = jnp.asarray(rng.normal(size=(9, H, W)).astype(np.float32))

    def loss_pallas(f):
        o, _ = R.rasterize_image(f, jnp.zeros((n, 2)), mean2d, radius,
                                 depth_z, jnp.asarray(cam), W, H, ch_sem,
                                 "traditional", entry_budget=8192)
        return jnp.sum(o * g_img)

    def loss_ref(f):
        o = REF.composite_reference(f, order, H, W, jnp.asarray(cam[4:7]),
                                    ch_sem, depth_mode="traditional",
                                    cam_k=jnp.asarray(cam[:4]))
        return jnp.sum(o * g_img)

    g_pallas = np.asarray(jax.grad(loss_pallas)(feats))
    g_ref = np.asarray(jax.grad(loss_ref)(feats))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_pallas, g_ref, atol=2e-3 * scale, rtol=5e-2)


def test_slab_lane_gather_matches_direct():
    """slab_lane_gather (the table-size-penalty dodge, k>1 path) must equal
    the plain lane gather exactly, including pad-lane zero reads and the
    k=1 small-table fallthrough."""
    rng = np.random.default_rng(3)
    C, L, E = 5, 4096, 10_000
    table = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, E).astype(np.int32))
    direct = np.asarray(table[:, idx])
    for k in (1, 2, 4):
        got = np.asarray(B.slab_lane_gather(table, idx, k=k))
        np.testing.assert_array_equal(got, direct)
    # adaptive pick stays 1 below the floor-rate threshold
    assert B.slab_k(L) == 1
    assert B.slab_k(1 << 21) == 4
    assert B.slab_k((1 << 20) + 1) == 1   # non-divisible stays direct
    # pad lanes read zero through the slab path
    padded = B.pad_lanes_for_slabs(table, min_pad=1)
    assert padded.shape[1] % 4 == 0
    pad_idx = jnp.asarray(np.full(8, L, np.int32))
    np.testing.assert_array_equal(
        np.asarray(B.slab_lane_gather(padded, pad_idx, k=4)), 0.0)
    # chunked index stream (the HBM cap on the (k*C, n) intermediate) is
    # bit-identical, including a ragged final chunk
    tiny = 64 * C * table.dtype.itemsize      # 64-index chunks
    got = np.asarray(B.slab_lane_gather(table, idx, k=4, chunk_bytes=tiny))
    np.testing.assert_array_equal(got, direct)


def test_segment_sum_grouped_matches_scatter():
    """The slab-gathered single-boundary segment sum (backward of the entry
    builder) must equal a reference scatter-add, including truncation to the
    kept-entry count."""
    rng = np.random.default_rng(4)
    n, budget, c = 37, 256, 3
    cnts = rng.integers(0, 14, n).astype(np.int32)
    offs = (np.cumsum(cnts) - cnts).astype(np.int32)
    total = int(cnts.sum())
    e_al = 384
    # grouped order: gaussian g owns slots [offs[g], offs[g]+cnts[g])
    gid_of_slot = np.repeat(np.arange(n), cnts)
    perm = rng.permutation(e_al).astype(np.int32)[:budget]
    g_entries = rng.normal(size=(c, e_al)).astype(np.float32)
    kept = min(total, budget)
    expect = np.zeros((c, n), np.float32)
    for j in range(kept):
        expect[:, gid_of_slot[j]] += g_entries[:, perm[j]]
    got = np.asarray(R._segment_sum_grouped(
        jnp.asarray(g_entries), jnp.asarray(perm), jnp.asarray(offs),
        jnp.asarray(cnts), jnp.asarray(total), budget))
    np.testing.assert_allclose(got, expect, atol=1e-5)

    # columns the kept prefix never references are the backward kernel's
    # UNWRITTEN slack — uninitialized memory that can be NaN. One NaN lane
    # in the cumsum block containing position `kept` poisons the boundary
    # most gaussians clamp to (NaN*0 == NaN through the triangular matmul);
    # the value mask must make the result identical and finite.
    referenced = set(int(p) for p in perm[:kept])
    g_nan = g_entries.copy()
    for j in range(e_al):
        if j not in referenced:
            g_nan[:, j] = np.nan
    got_nan = np.asarray(R._segment_sum_grouped(
        jnp.asarray(g_nan), jnp.asarray(perm), jnp.asarray(offs),
        jnp.asarray(cnts), jnp.asarray(total), budget))
    assert np.isfinite(got_nan).all()
    np.testing.assert_allclose(got_nan, expect, atol=1e-5)


def test_tile_32_matches_tile_16():
    """The tpu.tile knob (K.set_tile) must not change the rendered image or
    the gradients — within-tile compositing is depth-ordered at any tile
    edge; only the entry expansion E changes. Guards the cache invalidation
    too: a stale tile-16 entry builder served after set_tile(32) would
    produce garbage tile offsets."""
    feats, radius, cam = make_scene(n=50, seed=7)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    rng = np.random.default_rng(8)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def run(tile):
        K.set_tile(tile)

        def loss(f):
            out, _ = R.rasterize_image(
                f, jnp.zeros((f.shape[0], 2)), mean2d, radius, depth_z,
                jnp.asarray(cam), W, H, CH_SEM, "traditional",
                entry_budget=4096)
            return jnp.sum(out * g_img), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(feats)
        return np.asarray(out), np.asarray(g)

    try:
        out16, g16 = run(16)
        out32, g32 = run(32)
    finally:
        K.set_tile(16)
    np.testing.assert_allclose(out32, out16, atol=1e-5, rtol=1e-5)
    scale = max(np.abs(g16).max(), 1e-8)
    np.testing.assert_allclose(g32, g16, atol=1e-5 * scale, rtol=1e-4)


def test_chunk_512_matches_chunk_256():
    """The G chunk-size knob (K.set_chunk) must not change the rendered
    image or the gradients — chunking only re-blocks the depth-ordered
    entry walk (the early-termination rule is chunk-max transmittance, so
    a LARGER chunk can only composite a superset of entries, all of which
    carry weight < T_EPS). Guards the cache invalidation the same way
    test_tile_32_matches_tile_16 does for the tile knob."""
    feats, radius, cam = make_scene(n=50, seed=7)
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    rng = np.random.default_rng(9)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def run(g):
        K.set_chunk(g)

        def loss(f):
            out, _ = R.rasterize_image(
                f, jnp.zeros((f.shape[0], 2)), mean2d, radius, depth_z,
                jnp.asarray(cam), W, H, CH_SEM, "traditional",
                entry_budget=4096)
            return jnp.sum(out * g_img), out

        (l, out), grad = jax.value_and_grad(loss, has_aux=True)(feats)
        return np.asarray(out), np.asarray(grad)

    saved_g = K.G
    try:
        out256, g256 = run(256)
        out512, g512 = run(512)
        out128, g128 = run(128)
    finally:
        K.set_chunk(saved_g)
    scale = max(np.abs(g256).max(), 1e-8)
    np.testing.assert_allclose(out512, out256, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(g512, g256, atol=1e-5 * scale, rtol=1e-4)
    np.testing.assert_allclose(out128, out256, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(g128, g256, atol=1e-5 * scale, rtol=1e-4)


def _dense_strip_scene(n=1200, seed=11):
    """n near-opaque splats blanketing the TOP consensus strip (image rows
    0..7) of tile (0,0): the top 128-pixel strip saturates within the
    first chunk or two while the bottom strip keeps uncovered pixels
    (rows >= 14, T = 1) forever — the exact pattern where tile-wide
    consensus never terminates but strip consensus does."""
    rng = np.random.default_rng(seed)
    mean2d = np.stack([rng.uniform(-4, 20, n), rng.uniform(-4, 6, n)], 1)
    sig = 2.5
    conic = np.stack([np.full(n, 1 / sig**2), np.zeros(n),
                      np.full(n, 1 / sig**2)], 1)
    feats = np.zeros((n, PF.feature_dim(CH_SEM)), np.float32)
    feats[:, PF.F_MEAN_X] = mean2d[:, 0]
    feats[:, PF.F_MEAN_Y] = mean2d[:, 1]
    feats[:, PF.F_CONIC_A:PF.F_CONIC_C + 1] = conic
    feats[:, PF.F_OPACITY] = 0.99
    feats[:, PF.F_DEPTH_Z] = np.linspace(1.0, 8.0, n)
    normal = rng.normal(size=(n, 3))
    normal[:, 2] = -np.abs(normal[:, 2]) - 0.3
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    feats[:, PF.F_NORMAL:PF.F_NORMAL + 3] = normal
    feats[:, PF.F_PLANE_D] = np.abs(
        (normal * np.stack([rng.normal(size=n), rng.normal(size=n),
                            feats[:, PF.F_DEPTH_Z]], 1)).sum(1)) + 0.5
    feats[:, PF.F_NORMAL + 3:PF.F_NORMAL + 6] = rng.uniform(0, 1, (n, 3))
    feats[:, PF.F_NORMAL + 6:PF.F_NORMAL + 6 + CH_SEM] = rng.uniform(
        0, 1, (n, CH_SEM))
    radius = np.full(n, int(np.ceil(3 * sig)), np.int32)
    cam = np.array([30.0, 30.0, W / 2, H / 2, 0.1, 0.2, 0.3, 0.0],
                   np.float32)
    return jnp.asarray(feats), jnp.asarray(radius), cam


def test_strip_termination_semantics_and_fires():
    """Strip-granular early termination (K.STRIP_ROWS / set_strip_rows):

    (a) the top strip of the dense tile actually terminates early (its
        hidden per-strip chunk count < the live bottom strip's) while
        tile-wide consensus (strip_rows=0) never terminates;
    (b) outputs match the tile-consensus composite within the T_EPS
        truncation band (remaining transmittance bounds the dropped
        weight), and gradients within the same band summed over a strip.

    Termination granularity is a PERFORMANCE knob with bounded output
    effect — the CUDA fork drops the same sub-T_EPS contributions
    per-pixel (upstream forward.cu)."""
    feats, radius, cam = _dense_strip_scene()
    depth_z = feats[:, PF.F_DEPTH_Z]
    mean2d = feats[:, [PF.F_MEAN_X, PF.F_MEAN_Y]]
    rng = np.random.default_rng(12)
    g_img = jnp.asarray(rng.normal(size=(9 + CH_SEM, H, W)).astype(np.float32))

    def run(rows):
        K.set_strip_rows(rows)

        def loss(f):
            out, _ = R.rasterize_image(
                f, jnp.zeros((f.shape[0], 2)), mean2d, radius, depth_z,
                jnp.asarray(cam), W, H, CH_SEM, "traditional",
                entry_budget=4096)
            return jnp.sum(out * g_img), out

        (l, out), grad = jax.value_and_grad(loss, has_aux=True)(feats)

        # per-strip composited-chunk counts of tile (0,0) via the hidden
        # channel of a direct forward call
        f_pad = K.feat_rows(CH_SEM)
        pad_c = f_pad - (feats.shape[1] + 2)
        payload_t = jnp.concatenate(
            [feats.T, jnp.zeros((2, feats.shape[0]))]
            + ([jnp.zeros((pad_c, feats.shape[0]))] if pad_c else []), axis=0)
        build = R._make_entry_builder(W, H, 4096)
        feats_t, binn = build(payload_t, mean2d, radius, depth_z, None)
        n_tx, n_ty = B.tile_grid(W, H, K.TILE)
        tiles = K.rasterize_forward(feats_t, binn.tile_starts,
                                    binn.tile_counts, jnp.asarray(cam),
                                    n_tx, n_ty, CH_SEM, "traditional")
        oc = K.out_channels(CH_SEM)
        kcol = np.asarray(tiles[0, :, oc + 1])
        return np.asarray(out), np.asarray(grad), kcol, int(
            np.ceil(int(binn.tile_counts[0]) / K.G))

    saved_rows = K.STRIP_ROWS
    try:
        # 64-row strips: 4 consensus strips at TILE=16 (the default 128
        # gives only 2, which the <4-strips gate reverts to tile-wide)
        out_s, g_s, k_s, nch = run(64)
        out_t, g_t, k_t, _ = run(0)
    finally:
        K.set_strip_rows(saved_rows)

    assert nch >= 2, "scene must span multiple chunks in tile 0"
    # (a) termination fired per strip: top strip stopped before the bottom
    k_top, k_bot = k_s[:128].max(), k_s[128:].max()
    assert k_bot == nch, (k_bot, nch)      # uncovered pixels keep it live
    assert k_top < k_bot, (k_top, k_bot)
    # tile-wide consensus never terminates here (bottom pixels at T = 1)
    assert k_t.min() == nch

    # (b) truncation-band equality
    np.testing.assert_allclose(out_s, out_t, atol=3e-4, rtol=1e-4)
    scale = max(np.abs(g_t).max(), 1e-8)
    np.testing.assert_allclose(g_s, g_t, atol=3e-2 * scale, rtol=1e-3)
