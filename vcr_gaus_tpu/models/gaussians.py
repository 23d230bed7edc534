"""Fixed-capacity Gaussian population state + padded Adam + densify/prune.

TPU-first re-design of the reference's GaussianModel
(scene/gaussian_model.py:36-702). The reference grows/shrinks torch
Parameters and performs optimizer-state surgery on every densify/prune
(cat_tensors_to_optimizer :480-502, _prune_optimizer :442-460). On XLA that
would recompile every step, so here:

  * all per-Gaussian arrays are padded to a static ``capacity`` with an
    ``active`` mask; the population only changes by masked scatter,
  * the Adam moments live in identically-padded arrays inside the state, so
    "optimizer surgery" is the same scatter (new slots get zero moments,
    matching the reference's cat-with-zeros semantics),
  * clone/split/prune are pure jittable functions (capacity overflow drops
    the excess and reports it — the TPU analog of the reference's GPU
    memory guard, gaussian_model.py:588).

Parameter semantics (activations, init, LR schedule, densify rules) match
the reference; each function cites its counterpart.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import math as M
from ..utils import sh as SH


class GaussianParams(NamedTuple):
    """Learnable per-Gaussian parameters (padded to capacity).

    Layouts mirror the reference tensors (scene/gaussian_model.py:216-230):
    f_dc (N,1,3), f_rest (N,K,3) with K=(max_sh_degree+1)^2-1, obj_dc (N,1,S).
    """
    xyz: jnp.ndarray            # (C, 3)
    f_dc: jnp.ndarray           # (C, 1, 3)
    f_rest: jnp.ndarray         # (C, K, 3)
    log_scale: jnp.ndarray      # (C, 3)
    quat: jnp.ndarray           # (C, 4) unnormalized (w,x,y,z)
    logit_opacity: jnp.ndarray  # (C, 1)
    obj_dc: jnp.ndarray         # (C, 1, S) semantic features (S=0 disables)


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray           # () int32, shared bias-correction step


class GaussianState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    active: jnp.ndarray             # (C,) bool
    max_radii2d: jnp.ndarray        # (C,) f32
    grad_accum: jnp.ndarray         # (C,) f32 — sum ||d mean2d||
    denom: jnp.ndarray              # (C,) f32
    active_sh_degree: jnp.ndarray   # () int32

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    @property
    def num_active(self):
        return jnp.sum(self.active.astype(jnp.int32))

    # --- activations (scene/gaussian_model.py:37-52) ---
    @property
    def scaling(self):
        return jnp.exp(self.params.log_scale)

    @property
    def rotation(self):
        return M.safe_normalize(self.params.quat)

    @property
    def opacity(self):
        return jax.nn.sigmoid(self.params.logit_opacity)

    def shortest_axis_normal(self):
        """Per-Gaussian normal = rotation column of the smallest-scale axis
        (scene/gaussian_model.py:168-192)."""
        return M.shortest_axis_normal(self.scaling, self.params.quat)


def zeros_params(capacity: int, sh_degree: int, ch_sem: int) -> GaussianParams:
    k = (sh_degree + 1) ** 2 - 1
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, k, 3), jnp.float32),
        log_scale=jnp.zeros((capacity, 3), jnp.float32),
        quat=jnp.zeros((capacity, 4), jnp.float32),
        logit_opacity=jnp.zeros((capacity, 1), jnp.float32),
        obj_dc=jnp.zeros((capacity, 1, ch_sem), jnp.float32),
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                    sh_degree: int, ch_sem: int = 0,
                    seed: int = 0) -> GaussianState:
    """Init from a COLMAP point cloud (scene/gaussian_model.py:201-230):
    SH DC from color, isotropic log-scale from sqrt(mean sq dist to 3 NN),
    identity quats, opacity 0.1."""
    from ..ops.knn import mean_sq_dist_to_3nn

    n = points.shape[0]
    assert n <= capacity, f"init pcd ({n}) exceeds capacity ({capacity})"
    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_sq_dist_to_3nn(pts), 1e-7)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, 1)

    p = zeros_params(capacity, sh_degree, ch_sem)
    pad = lambda a, v: a.at[:n].set(v)
    p = p._replace(
        xyz=pad(p.xyz, pts),
        f_dc=pad(p.f_dc, SH.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        log_scale=pad(p.log_scale, log_scale),
        quat=pad(p.quat, jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1)),
        logit_opacity=pad(p.logit_opacity,
                          M.inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
    )
    if ch_sem:
        rng = np.random.default_rng(seed)
        sem = SH.rgb_to_sh(jnp.asarray(rng.random((n, ch_sem)), jnp.float32))
        p = p._replace(obj_dc=pad(p.obj_dc, sem[:, None, :]))

    active = jnp.zeros((capacity,), bool).at[:n].set(True)
    zp = zeros_params(capacity, sh_degree, ch_sem)
    return GaussianState(
        params=p,
        adam=AdamState(mu=zp, nu=zp, step=jnp.zeros((), jnp.int32)),
        active=active,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# padded Adam (per-group LRs; eps matches torch.optim.Adam(eps=1e-15),
# scene/gaussian_model.py:258)
# ---------------------------------------------------------------------------

B1, B2, EPS = 0.9, 0.999, 1e-15


class LearningRates(NamedTuple):
    """Per-group LRs (configs/config_base.yaml:41-50). xyz follows the expon
    schedule and is passed per-step."""
    xyz: jnp.ndarray
    f_dc: float
    f_rest: float
    opacity: float
    scaling: float
    rotation: float
    obj_dc: float


def adam_step(state: GaussianState, grads: GaussianParams,
              lrs: LearningRates) -> GaussianState:
    """One Adam update over all padded parameter arrays. Inactive slots have
    zero grads by construction (masked upstream), so their moments stay 0.

    Deviation from torch: bias correction uses one shared step count instead
    of per-tensor steps after surgery; newly-allocated slots therefore see
    slightly smaller effective warmup — metric-neutral at 3DGS scales."""
    step = state.adam.step + 1
    bc1 = 1.0 - B1 ** step.astype(jnp.float32)
    bc2 = 1.0 - B2 ** step.astype(jnp.float32)
    lr_map = GaussianParams(
        xyz=lrs.xyz, f_dc=lrs.f_dc, f_rest=lrs.f_rest,
        log_scale=lrs.scaling, quat=lrs.rotation,
        logit_opacity=lrs.opacity, obj_dc=lrs.obj_dc)

    def upd(p, g, mu, nu, lr):
        mu = B1 * mu + (1 - B1) * g
        nu = B2 * nu + (1 - B2) * g * g
        mu_hat = mu / bc1
        nu_hat = nu / bc2
        return p - lr * mu_hat / (jnp.sqrt(nu_hat) + EPS), mu, nu

    new_p, new_mu, new_nu = [], [], []
    for p, g, mu, nu, lr in zip(state.params, grads, state.adam.mu,
                                state.adam.nu, lr_map):
        np_, nmu, nnu = upd(p, g, mu, nu, lr)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)
    return state._replace(
        params=GaussianParams(*new_p),
        adam=AdamState(GaussianParams(*new_mu), GaussianParams(*new_nu), step))


def mask_grads(grads: GaussianParams, active: jnp.ndarray) -> GaussianParams:
    """Zero gradients of inactive slots (keeps their params/moments frozen)."""
    def m(g):
        shape = (-1,) + (1,) * (g.ndim - 1)
        return g * active.astype(g.dtype).reshape(shape)
    return GaussianParams(*(m(g) for g in grads))


# ---------------------------------------------------------------------------
# population edits: allocation, clone, split, prune (masked, fixed capacity)
# ---------------------------------------------------------------------------

def _slot_assignment(active, sel):
    """For each selected slot (in index order), the index of a distinct free
    slot. Returns (src (C,), dst (C,), valid (C,)) where entry j maps
    src[j] -> dst[j] for j < num_valid; overflow beyond the free-slot supply
    is dropped (valid=False)."""
    c = active.shape[0]
    order_src = jnp.argsort(~sel)                       # selected first
    order_dst = jnp.argsort(active)                     # free slots first
    n_sel = jnp.sum(sel.astype(jnp.int32))
    n_free = jnp.sum((~active).astype(jnp.int32))
    j = jnp.arange(c)
    valid = (j < n_sel) & (j < n_free)
    return order_src, order_dst, valid


def _scatter_copy(params: GaussianParams, src, dst, valid) -> GaussianParams:
    """params[dst[j]] = params[src[j]] for valid j (drop-mode scatter)."""
    c = params.xyz.shape[0]
    dst_safe = jnp.where(valid, dst, c)                # out-of-range -> drop

    def cp(a):
        return a.at[dst_safe].set(a[src], mode="drop")
    return GaussianParams(*(cp(a) for a in params))


def _zero_rows(params: GaussianParams, rows_mask) -> GaussianParams:
    def z(a):
        shape = (-1,) + (1,) * (a.ndim - 1)
        return a * (~rows_mask).astype(a.dtype).reshape(shape)
    return GaussianParams(*(z(a) for a in params))


def prune(state: GaussianState, prune_mask: jnp.ndarray) -> GaussianState:
    """Deactivate + zero params/moments/stats of pruned slots
    (scene/gaussian_model.py:462-478). Zeroing lets freed slots be reused by
    later densification with clean state."""
    kill = prune_mask & state.active
    keep_active = state.active & ~kill
    return state._replace(
        params=_zero_rows(state.params, kill),
        adam=state.adam._replace(mu=_zero_rows(state.adam.mu, kill),
                                 nu=_zero_rows(state.adam.nu, kill)),
        active=keep_active,
        max_radii2d=jnp.where(kill, 0.0, state.max_radii2d),
        grad_accum=jnp.where(kill, 0.0, state.grad_accum),
        denom=jnp.where(kill, 0.0, state.denom),
    )


def _insert_copies(state: GaussianState, sel: jnp.ndarray,
                   edit_fn=None) -> tuple[GaussianState, jnp.ndarray]:
    """Copy selected rows into free slots (zero moments, zero stats). edit_fn
    optionally rewrites the copied params given (params, src, dst, valid).
    Returns (state, n_dropped)."""
    src, dst, valid = _slot_assignment(state.active, sel)
    new_params = _scatter_copy(state.params, src, dst, valid)
    if edit_fn is not None:
        new_params = edit_fn(new_params, src, dst, valid)
    c = state.capacity
    dst_safe = jnp.where(valid, dst, c)
    new_active = state.active.at[dst_safe].set(True, mode="drop")
    n_sel = jnp.sum(sel.astype(jnp.int32))
    n_free = jnp.sum((~state.active).astype(jnp.int32))
    dropped = jnp.maximum(n_sel - n_free, 0)
    return state._replace(params=new_params, active=new_active), dropped


def densify_and_clone(state: GaussianState, grads_norm, grad_threshold,
                      percent_dense, scene_extent):
    """Clone small high-gradient gaussians (gaussian_model.py:629-643):
    exact copies; new slots start with zero Adam moments."""
    max_scale = jnp.max(state.scaling, axis=-1)
    sel = (state.active & (grads_norm >= grad_threshold)
           & (max_scale <= percent_dense * scene_extent))
    return _insert_copies(state, sel)


def densify_and_split_along_maxscaling(
        state: GaussianState, grads_norm, grad_threshold, percent_dense,
        scene_extent, box_mask=None, n_std: float = 2.0):
    """VCR-GauS split: two children displaced +-(n_std/3)*max_scale along the
    longest axis, that axis' scale divided by 1.6
    (gaussian_model.py:579-627). ``box_mask`` is the optional
    large-percent-dense & inside-box & visibility gate (:588-596). The parent
    slot is overwritten by child 1 (moments zeroed); child 2 allocates a free
    slot."""
    max_scale = jnp.max(state.scaling, axis=-1)
    sel = (state.active & (grads_norm >= grad_threshold)
           & (max_scale > percent_dense * scene_extent))
    if box_mask is not None:
        sel = sel | (state.active & box_mask)

    dirs, max_scaling, axis = M.longest_axis_dir(state.scaling,
                                                 state.params.quat)
    offset = dirs * (n_std * max_scaling / 3.0)[:, None]
    child_scale = M.set_axis_value(state.scaling, axis, max_scaling / 1.6)
    child_log_scale = jnp.log(jnp.maximum(child_scale, 1e-12))

    # child 1 overwrites the parent slot
    p = state.params
    selc = sel[:, None]
    p1 = p._replace(
        xyz=jnp.where(selc, p.xyz + offset, p.xyz),
        log_scale=jnp.where(selc, child_log_scale, p.log_scale),
    )
    # parent's moments/stats are reset (reference prunes the parent and the
    # children enter with zero moments)
    adam = state.adam._replace(mu=_zero_rows(state.adam.mu, sel),
                               nu=_zero_rows(state.adam.nu, sel))
    st = state._replace(
        params=p1, adam=adam,
        max_radii2d=jnp.where(sel, 0.0, state.max_radii2d),
        grad_accum=jnp.where(sel, 0.0, state.grad_accum),
        denom=jnp.where(sel, 0.0, state.denom))

    # child 2 copies into a free slot with the mirrored offset
    def edit(params, src, dst, valid):
        c = state.capacity
        dst_safe = jnp.where(valid, dst, c)
        # copied row already contains child-1 values (offset applied);
        # rewrite xyz as parent - offset = copied - 2*offset
        new_xyz = params.xyz.at[dst_safe].add(-2.0 * offset[src], mode="drop")
        return params._replace(xyz=new_xyz)

    return _insert_copies(st, sel, edit)


def densify_and_prune(state: GaussianState, grad_threshold, min_opacity,
                      scene_extent, max_screen_size, percent_dense,
                      box_mask=None):
    """The reference's combined densify step (gaussian_model.py:645-659):
    clone + split-along-max-axis from accumulated grads, then prune by
    opacity / screen radius / world size. Returns (state, dropped_total)."""
    grads_norm = jnp.where(state.denom > 0,
                           state.grad_accum / jnp.maximum(state.denom, 1.0),
                           0.0)
    state, d1 = densify_and_clone(state, grads_norm, grad_threshold,
                                  percent_dense, scene_extent)
    state, d2 = densify_and_split_along_maxscaling(
        state, grads_norm, grad_threshold, percent_dense, scene_extent,
        box_mask=box_mask)

    prune_mask = state.opacity[:, 0] < min_opacity
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.max(state.scaling, -1) > 0.1 * scene_extent
        prune_mask = prune_mask | big_vs | big_ws
    state = prune(state, prune_mask)
    # densification stats restart after each densify round
    state = state._replace(
        grad_accum=jnp.zeros_like(state.grad_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d))
    return state, d1 + d2


def prune_by_importance(state: GaussianState, imp_score, percent: float):
    """LightGaussian percentile prune (gaussian_model.py:661-667 +
    tools/prune.py:6-22 scoring applied by the caller): drop the lowest
    ``percent`` of active gaussians by score.

    POSITIONAL — a deliberate divergence from the reference's threshold
    prune (gaussian_model.py:661-667 compares import_score <= the
    percentile VALUE): exactly k = percent*(n_act-1) gaussians go,
    stable-tie-broken by slot index, so on tied scores this prunes FEWER
    than the reference. The threshold form kills the ENTIRE population
    when scores tie at the threshold — with degenerate all-equal
    importance it prunes 100%, which the on-chip schedule rehearsal
    caught as an empty model at save time."""
    score = jnp.where(state.active, imp_score, jnp.inf)
    n_act = jnp.sum(state.active.astype(jnp.int32))
    k = (percent * (n_act.astype(jnp.float32) - 1.0)).astype(jnp.int32)
    iota = jnp.arange(state.capacity, dtype=jnp.int32)
    _, order = jax.lax.sort((score, iota), num_keys=1)
    rank = jnp.zeros((state.capacity,), jnp.int32).at[order].set(iota)
    return prune(state, rank < k)


def v_imp_score(state: GaussianState, imp_list, v_pow: float):
    """Volume-reweighted importance (tools/prune.py:6-22): multiply by
    (volume / 90th-percentile-volume)^v_pow."""
    volume = jnp.prod(state.scaling, axis=-1)
    vol_act = jnp.where(state.active, volume, -jnp.inf)
    n_act = jnp.sum(state.active.astype(jnp.int32))
    sorted_desc = -jnp.sort(-vol_act)
    idx = (0.9 * n_act.astype(jnp.float32)).astype(jnp.int32)
    kth = sorted_desc[jnp.clip(idx, 0, state.capacity - 1)]
    return jnp.power(volume / kth, v_pow) * imp_list


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <=0.01 and reset its Adam moments
    (gaussian_model.py:361-364 + replace_tensor_to_optimizer:425-440)."""
    new_op = M.inverse_sigmoid(jnp.minimum(state.opacity, 0.01))
    zero_op = jnp.zeros_like(new_op)
    return state._replace(
        params=state.params._replace(logit_opacity=new_op),
        adam=state.adam._replace(
            mu=state.adam.mu._replace(logit_opacity=zero_op),
            nu=state.adam.nu._replace(logit_opacity=zero_op)))


def add_densification_stats(state: GaussianState, abs_grad2d, radii,
                            visibility) -> GaussianState:
    """Accumulate screen-space gradient norms + max radii
    (trainer.py:343-347, gaussian_model.py:669-671). ``abs_grad2d`` is the
    (C,2) |d mean2d| stream from the rasterizer's densify-dummy gradient."""
    gnorm = jnp.linalg.norm(abs_grad2d, axis=-1)
    vis = visibility & state.active
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d,
                                               radii.astype(jnp.float32)),
                              state.max_radii2d))


def oneup_sh_degree(state: GaussianState, max_sh_degree: int) -> GaussianState:
    return state._replace(active_sh_degree=jnp.minimum(
        state.active_sh_degree + 1, max_sh_degree))


def expand_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Grow the padded capacity (host-side; triggers recompiles downstream).
    The TPU analog of PyTorch's dynamic tensor growth — invoked by the
    trainer when densification starts dropping splats (the reference instead
    gates densify on a GPU memory cap, gaussian_model.py:588)."""
    old = state.capacity
    assert new_capacity > old
    extra = new_capacity - old

    def pad(a):
        widths = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    pad_params = lambda p: GaussianParams(*(pad(x) for x in p))
    return GaussianState(
        params=pad_params(state.params),
        adam=AdamState(pad_params(state.adam.mu), pad_params(state.adam.nu),
                       state.adam.step),
        active=pad(state.active),
        max_radii2d=pad(state.max_radii2d),
        grad_accum=pad(state.grad_accum),
        denom=pad(state.denom),
        active_sh_degree=state.active_sh_degree,
    )
