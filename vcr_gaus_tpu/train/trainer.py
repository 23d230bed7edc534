"""Training loop: jitted step + host-side schedule.

TPU re-design of the reference Trainer (trainer.py:42-710). The per-iteration
work (render -> loss assembly -> backward -> Adam -> densification stats) is
ONE jitted function over the fixed-capacity state; the host loop only handles
the schedule (LR, SH warmup, densify interval, opacity reset, LightGaussian
prune, eval/save) and per-step camera selection.

Loss assembly mirrors trainer.py:233-321; every loss cites its source there.
Static "gates" (the *_from_iter thresholds) are trace-time constants — each
threshold crossing recompiles once.
"""

from __future__ import annotations

import functools
import json
import math
import os
import random
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.cameras import Camera, CameraArrays
from ..data.scene import SceneInfo, camera_to_json, load_scene_info
from ..models import appearance as APP
from ..models import gaussians as GM
from ..models import ply_io
from ..render.renderer import RenderConfig, render, render_stats
from ..utils import math as M
from . import losses as L


class NetState(NamedTuple):
    """Side networks + their optax states (all optional pytrees or None)."""
    app_embeddings: Any
    app_params: Any
    app_opt: Any
    cls_params: Any
    cls_opt: Any


class Gates(NamedTuple):
    """Static loss gates resolved per compile (trainer.py:263-305)."""
    mono_normal: bool
    depth_normal: bool
    curv: bool
    consistent_normal: bool
    close_depth: bool


def compute_losses(out, cam: CameraArrays, state: GM.GaussianState,
                   weights: dict, gates: Gates, cfg, net: NetState,
                   inside_mask, num_cls: int):
    """The reference's _compute_loss (trainer.py:233-308), jit-able."""
    losses = {}
    gt = cam.image
    if net.app_params is not None:
        transformed, (top, left, h, w) = APP.appearance_transform(
            net.app_params, net.app_embeddings, out["render"], cam.idx)
        gt_crop = jax.lax.dynamic_slice(gt, (0, top, left), (3, h, w))
        losses["l1"] = L.l1_loss(transformed, gt_crop)
    else:
        losses["l1"] = L.l1_loss(out["render"], gt)
    losses["ssim"] = 1.0 - L.ssim(out["render"], gt)

    act = state.active
    if weights.get("l1_scale", 0) > 0:
        min_scale = jnp.min(state.scaling, -1)
        m = (act & inside_mask).astype(jnp.float32)
        losses["l1_scale"] = jnp.sum(min_scale * m) / jnp.maximum(m.sum(), 1.0)
    if weights.get("entropy", 0) > 0:
        losses["entropy"] = L.entropy_loss(state.opacity[:, 0],
                                           act & inside_mask)
    if weights.get("mono_depth", 0) > 0:
        m = (out["depth"] > 0) & cam.has_depth
        losses["mono_depth"] = L.scale_and_shift_invariant_depth_loss(
            out["depth"], cam.depth, m.astype(jnp.float32))
    gt_normal = jnp.moveaxis(cam.normal, 0, -1)           # (H,W,3)
    if weights.get("mono_normal", 0) > 0 and gates.mono_normal:
        losses["mono_normal"] = L.monosdf_normal_loss(out["normal"],
                                                      gt_normal)
    if weights.get("depth_normal", 0) > 0 and gates.depth_normal:
        w_conf = L.cos_weight(jax.lax.stop_gradient(out["normal"]),
                              gt_normal, cfg.optim.exp_t)
        losses["depth_normal"] = L.masked_monosdf_normal_loss(
            out["est_normal"], gt_normal, out["mask"], w_conf)
        if weights.get("curv", 0) > 0 and gates.curv:
            curv = L.normal2curv(out["est_normal"],
                                 out["mask"][..., None].astype(jnp.float32))
            losses["curv"] = jnp.abs(curv).mean()
    if weights.get("consistent_normal", 0) > 0 and gates.consistent_normal:
        losses["consistent_normal"] = L.monosdf_normal_loss(
            out["est_normal"], out["normal"])
    if weights.get("distortion", 0) > 0 and gates.close_depth:
        losses["distortion"] = L.edge_aware_distortion_map(
            gt, out["distortion"]).mean()
    if weights.get("depth_var", 0) > 0 and gates.close_depth:
        losses["depth_var"] = L.edge_aware_distortion_map(
            gt, out["depth_var"]).mean()
    if weights.get("semantic", 0) > 0:
        losses["semantic"] = L.semantic_cross_entropy(
            out["render_sem"], cam.mask, num_cls)

    total = jnp.asarray(0.0)
    for name, w in weights.items():
        if name in losses:
            total = total + w * losses[name]
    losses["total"] = total
    return total, losses


def _make_step_impl(cfg, rcfg: RenderConfig, weights: dict,
                    scene_extent: float, trans, scale, num_cls: int,
                    app_tx, cls_tx):
    """Shared per-camera step body. ``axis`` != None enables camera
    data-parallelism: gradients/losses are pmean-ed over the mesh axis,
    densification stats reduced (max radii/visibility, mean |d mean2d|) so
    the replicated state stays identical on every chip."""

    def step_impl(state: GM.GaussianState, net: NetState, cam: CameraArrays,
                  bg, lr_xyz, *, sh_degree: int, gates: Gates,
                  axis: str | None = None, bin_aux=None, next_cam=None,
                  k: int = 1):
        """k > 1: `cam` (and bin_aux/next_cam when given) carry a leading
        local-camera axis of size k — the per-chip share of a camera batch
        larger than the mesh. The k renders are unrolled at trace time and
        their gradients/stats averaged before the (replicated) update."""
        inside_mask, _ = M.get_inside_normalized(state.params.xyz,
                                                 jnp.asarray(trans),
                                                 jnp.asarray(scale))

        def make_loss_fn(cam_i, bin_aux_i):
            def loss_fn(params, dummy, app_emb, app_params, cls_params):
                st = state._replace(params=params)
                classifier = None
                if cls_params is not None:
                    clf = APP.SemanticClassifier(num_cls)
                    classifier = lambda f: clf.apply(cls_params, f)
                out = render(st, cam_i, rcfg, bg, sh_degree,
                             scene_extent=scene_extent,
                             classifier=classifier,
                             densify_dummy=dummy, bin_aux=bin_aux_i)
                net2 = net._replace(app_embeddings=app_emb,
                                    app_params=app_params)
                total, losses = compute_losses(out, cam_i, st, weights,
                                               gates, cfg, net2, inside_mask,
                                               num_cls)
                return total, (losses, out)
            return loss_fn

        def pick(tree, i):
            return (None if tree is None else
                    jax.tree.map(lambda x: x[i], tree))

        dummy = jnp.zeros((state.capacity, 2), jnp.float32)
        grads = losses = None
        radii = visibility = overflow = num_entries = None
        for i in range(k):
            cam_i = pick(cam, i) if k > 1 else cam
            bin_i = pick(bin_aux, i) if k > 1 else bin_aux
            grad_fn = jax.value_and_grad(
                make_loss_fn(cam_i, bin_i), argnums=(0, 1, 2, 3, 4),
                has_aux=True)
            (total, (losses_i, out)), grads_i = grad_fn(
                state.params, dummy, net.app_embeddings, net.app_params,
                net.cls_params)
            if grads is None:
                grads, losses = grads_i, losses_i
                radii = out["radii"]
                visibility = out["visibility_filter"]
                overflow = out["overflow"].astype(jnp.float32)
                num_entries = out["num_entries"]
            else:
                add = lambda a, b: None if a is None else a + b
                grads = jax.tree.map(add, grads, grads_i,
                                     is_leaf=lambda x: x is None)
                losses = jax.tree.map(add, losses, losses_i)
                radii = jnp.maximum(radii, out["radii"])
                visibility = visibility | out["visibility_filter"]
                overflow = jnp.maximum(
                    overflow, out["overflow"].astype(jnp.float32))
                num_entries = jnp.maximum(num_entries, out["num_entries"])
        if k > 1:
            inv = 1.0 / k
            scale_ = lambda a: None if a is None else a * inv
            grads = jax.tree.map(scale_, grads,
                                 is_leaf=lambda x: x is None)
            losses = jax.tree.map(scale_, losses)
        g_params, g_dummy, g_emb, g_app, g_cls = grads
        if axis is not None:
            # ICI all-reduce of everything that feeds the replicated update
            (g_params, g_dummy, g_emb, g_app, g_cls, losses) = jax.lax.pmean(
                (g_params, g_dummy, g_emb, g_app, g_cls, losses), axis)
            radii = jax.lax.pmax(radii, axis)
            visibility = jax.lax.pmax(visibility.astype(jnp.int32),
                                      axis) > 0
            overflow = jax.lax.pmax(overflow, axis)
            num_entries = jax.lax.pmax(num_entries, axis)

        # gaussian Adam
        g_params = GM.mask_grads(g_params, state.active)
        lrs = GM.LearningRates(
            xyz=lr_xyz, f_dc=cfg.optim.feature_lr,
            f_rest=cfg.optim.feature_lr / 20.0,
            opacity=cfg.optim.opacity_lr, scaling=cfg.optim.scaling_lr,
            rotation=cfg.optim.rotation_lr, obj_dc=cfg.optim.feature_lr)
        new_state = GM.adam_step(state, g_params, lrs)

        # densification statistics (trainer.py:343-347). Unit parity: the
        # reference CUDA backward reports mean2D grads through the ndc2Pix
        # jacobian (upstream backward.cu: ddelx_dx = 0.5*W, ddely_dy =
        # 0.5*H), while the kernel's densify stream is raw PIXEL-unit
        # |d mean2d| — scale here, or the shared densify_grad_threshold
        # (config_base.yaml:59, 5e-4) sits ~0.5*W too high and gradient
        # densification never fires (caught by the r4 rehearsal: n_active
        # froze at the init count through the whole densify window).
        ndc_scale = jnp.array([0.5 * rcfg.width, 0.5 * rcfg.height],
                              jnp.float32)
        new_state = GM.add_densification_stats(
            new_state, g_dummy * ndc_scale, radii, visibility)

        # side networks
        new_net = net
        if net.app_params is not None:
            upd, new_opt = app_tx.update((g_emb, g_app), net.app_opt,
                                         (net.app_embeddings, net.app_params))
            new_emb, new_app = optax.apply_updates(
                (net.app_embeddings, net.app_params), upd)
            new_net = new_net._replace(app_embeddings=new_emb,
                                       app_params=new_app, app_opt=new_opt)
        if net.cls_params is not None:
            upd, new_opt = cls_tx.update(g_cls, net.cls_opt, net.cls_params)
            new_net = new_net._replace(
                cls_params=optax.apply_updates(net.cls_params, upd),
                cls_opt=new_opt)

        aux = {"overflow": overflow > 0,
               "num_entries": num_entries,
               "n_active": new_state.num_active}
        if next_cam is not None:
            # binning lookahead for the NEXT camera(s) against the
            # post-update parameters: their sort->gather consumers then sit
            # in the next dispatch (see ops/rasterize.BinAux)
            from ..render.renderer import compute_camera_binning
            if k > 1:
                auxs = [compute_camera_binning(new_state, pick(next_cam, i),
                                               rcfg) for i in range(k)]
                aux["next_bin_aux"] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *auxs)
            else:
                aux["next_bin_aux"] = compute_camera_binning(
                    new_state, next_cam, rcfg)
        return new_state, new_net, losses, aux

    return step_impl


def make_train_step(cfg, rcfg: RenderConfig, weights: dict,
                    scene_extent: float, trans, scale, num_cls: int,
                    app_tx, cls_tx):
    """Single-chip jitted train step."""
    impl = _make_step_impl(cfg, rcfg, weights, scene_extent, trans, scale,
                           num_cls, app_tx, cls_tx)

    @functools.partial(jax.jit, static_argnames=("sh_degree", "gates"))
    def train_step(state, net, cam, bg, lr_xyz, sh_degree: int, gates: Gates,
                   bin_aux=None, next_cam=None):
        return impl(state, net, cam, bg, lr_xyz, sh_degree=sh_degree,
                    gates=gates, bin_aux=bin_aux, next_cam=next_cam)

    return train_step


def make_multi_train_step(cfg, rcfg: RenderConfig, weights: dict,
                          scene_extent: float, trans, scale, num_cls: int,
                          app_tx, cls_tx, k: int):
    """k sequential train steps chained in ONE XLA program via lax.scan.

    Per-step dispatch (host->device program launch + the control round-trip,
    ~5 ms through the dev tunnel, ~0.1-0.5 ms in production) is paid once
    per k steps. The scan body is the SAME step_impl as make_train_step, so
    the math per iteration is identical; the only semantic delta is binning
    staleness — step i of a superstep consumes the BinAux produced by step i
    of the PREVIOUS superstep, so tile assignments lag k steps instead of 1.
    Position drift per Adam step is <<1 px and rects round outward to tile
    boundaries (~8 px expected slack), so k<=16 is comfortably safe; the
    on-chip e2e gate validates training quality with k=10.

    Inputs carry a leading step axis of size k: cams/bin_aux/next_cams are
    stacked pytrees, bgs (k,3), lrs (k,). ``bin_aux=None`` (first superstep
    or post-invalidation) falls back to in-program binning for every step.
    Returns last-step losses and a reduced aux (overflow any-of, num_entries
    max-of) plus the stacked next_bin_aux for the following superstep."""
    impl = _make_step_impl(cfg, rcfg, weights, scene_extent, trans, scale,
                           num_cls, app_tx, cls_tx)

    @functools.partial(jax.jit, static_argnames=("sh_degree", "gates"))
    def multi_step(state, net, cams, bgs, lrs, sh_degree: int, gates: Gates,
                   bin_aux=None, next_cams=None):
        has_bin = bin_aux is not None

        def body(carry, xs):
            st, nt = carry
            if has_bin:
                cam, bg, lr, ba, nc = xs
            else:
                cam, bg, lr, nc = xs
                ba = None
            st, nt, losses, aux = impl(st, nt, cam, bg, lr,
                                       sh_degree=sh_degree, gates=gates,
                                       bin_aux=ba, next_cam=nc)
            nba = aux.pop("next_bin_aux")
            return (st, nt), (losses, aux, nba)

        xs = ((cams, bgs, lrs, bin_aux, next_cams) if has_bin
              else (cams, bgs, lrs, next_cams))
        (state, net), (losses_k, aux_k, nba_k) = jax.lax.scan(
            body, (state, net), xs)
        losses = jax.tree.map(lambda x: x[-1], losses_k)
        aux = {"overflow": jnp.any(aux_k["overflow"]),
               "num_entries": jnp.max(aux_k["num_entries"]),
               "n_active": aux_k["n_active"][-1],
               "next_bin_aux": nba_k}
        return state, net, losses, aux

    return multi_step


def make_dp_train_step(cfg, rcfg: RenderConfig, weights: dict,
                       scene_extent: float, trans, scale, num_cls: int,
                       app_tx, cls_tx, mesh, axis: str = "data"):
    """Camera-data-parallel train step over a device mesh: the state and
    networks are replicated, the camera batch (leading dim B, a multiple of
    the mesh size) is sharded B/mesh-per-chip, gradients ride the ICI as a
    pmean (SURVEY.md §5.8's stretch camera-parallel mode).

    Per-chip binning lookahead: pass ``next_cam`` (the NEXT camera batch,
    same sharding) to get ``aux['next_bin_aux']`` — a per-chip-stacked
    BinAux batch to feed back as ``bin_aux`` on the following step, keeping
    the single-chip sort->gather dispatch-boundary optimization in the DP
    path too."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    impl = _make_step_impl(cfg, rcfg, weights, scene_extent, trans, scale,
                           num_cls, app_tx, cls_tx)
    n_chips = mesh.devices.size

    @functools.lru_cache(maxsize=None)
    def build(sh_degree: int, gates: Gates, k: int, has_bin: bool,
              has_next: bool):
        def step_local(state, net, cam, bg, lr_xyz, bin_, nxt):
            """One DP step on this chip's k-camera share (pmean inside)."""
            if k == 1:
                # drop the singleton local axis (and regain it on output)
                cam = jax.tree.map(lambda x: x[0], cam)
                bin_ = (jax.tree.map(lambda x: x[0], bin_)
                        if bin_ is not None else None)
                nxt = (jax.tree.map(lambda x: x[0], nxt)
                       if nxt is not None else None)
            st, nt, losses, aux = impl(
                state, net, cam, bg, lr_xyz, sh_degree=sh_degree,
                gates=gates, axis=axis, bin_aux=bin_, next_cam=nxt, k=k)
            if nxt is not None and k == 1:
                aux["next_bin_aux"] = jax.tree.map(
                    lambda x: x[None], aux["next_bin_aux"])
            return st, nt, losses, aux

        def local(state, net, cam_batch, bg, lr_xyz, bin_aux, next_cam):
            return step_local(state, net, cam_batch, bg, lr_xyz,
                              bin_aux if has_bin else None,
                              next_cam if has_next else None)

        aux_spec = {"overflow": P(), "num_entries": P(), "n_active": P()}
        if has_next:
            aux_spec["next_bin_aux"] = P(axis)
        sharded = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P(),
                      P(axis) if has_bin else P(),
                      P(axis) if has_next else P()),
            out_specs=(P(), P(), P(), aux_spec),
            check_vma=False)
        return jax.jit(sharded), step_local

    @functools.lru_cache(maxsize=None)
    def build_multi(sh_degree: int, gates: Gates, k: int, has_bin: bool):
        """Superstep x camera-DP composition: a lax.scan of s DP steps INSIDE
        the shard_map, so per-step dispatch overhead is paid once per s steps
        on the multi-chip path too (round-2 weak #3: supersteps and DP did
        not compose). Inputs carry a leading step axis: cams (s, B, ...)
        sharded over dim 1, bgs (s, 3), lrs (s,); the binning lookahead
        chains step i's next_bin_aux into step i+1 of the NEXT superstep,
        exactly like make_multi_train_step."""
        _, step_local = build(sh_degree, gates, k, has_bin, True)

        def local(state, net, cams, bgs, lrs, bin_aux, next_cams):
            def body(carry, xs):
                st, nt = carry
                if has_bin:
                    cam, bg, lr, ba, nc = xs
                else:
                    cam, bg, lr, nc = xs
                    ba = None
                st, nt, losses, aux = step_local(st, nt, cam, bg, lr, ba, nc)
                nba = aux.pop("next_bin_aux")
                return (st, nt), (losses, aux, nba)

            xs = ((cams, bgs, lrs, bin_aux, next_cams) if has_bin
                  else (cams, bgs, lrs, next_cams))
            (state, net), (losses_s, aux_s, nba_s) = jax.lax.scan(
                body, (state, net), xs)
            losses = jax.tree.map(lambda x: x[-1], losses_s)
            aux = {"overflow": jnp.any(aux_s["overflow"]),
                   "num_entries": jnp.max(aux_s["num_entries"]),
                   "n_active": aux_s["n_active"][-1],
                   "next_bin_aux": nba_s}
            return state, net, losses, aux

        aux_spec = {"overflow": P(), "num_entries": P(), "n_active": P(),
                    "next_bin_aux": P(None, axis)}
        sharded = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(None, axis), P(), P(),
                      P(None, axis) if has_bin else P(),
                      P(None, axis)),
            out_specs=(P(), P(), P(), aux_spec),
            check_vma=False)
        return jax.jit(sharded)

    def train_step(state, net, cam_batch, bg, lr_xyz, sh_degree: int,
                   gates: Gates, bin_aux=None, next_cam=None):
        batch = jax.tree.leaves(cam_batch)[0].shape[0]
        if batch % n_chips:
            raise ValueError(f"camera batch {batch} not divisible by "
                             f"mesh size {n_chips}")
        k = batch // n_chips
        fn, _ = build(sh_degree, gates, k, bin_aux is not None,
                      next_cam is not None)
        return fn(state, net, cam_batch, bg, lr_xyz, bin_aux, next_cam)

    def multi_train_step(state, net, cams, bgs, lrs, sh_degree: int,
                         gates: Gates, bin_aux=None, next_cams=None):
        """s supersteps over the mesh: cams leaves (s, B, ...), B a multiple
        of the mesh size; next_cams REQUIRED (the lookahead is what makes
        supersteps pay on this path too)."""
        batch = jax.tree.leaves(cams)[0].shape[1]
        if batch % n_chips:
            raise ValueError(f"camera batch {batch} not divisible by "
                             f"mesh size {n_chips}")
        k = batch // n_chips
        fn = build_multi(sh_degree, gates, k, bin_aux is not None)
        return fn(state, net, cams, bgs, lrs, bin_aux, next_cams)

    train_step.multi = multi_train_step
    return train_step


class _StageProf:
    """Wall-clock stage accounting for the real training loop (r4 VERDICT
    weak #4: the rehearsal ran ~10x below the bench step at the same shape
    with no stage split). Buckets accumulate seconds + entry counts via two
    perf_counter calls per entry — cheap enough to stay always-on. The key
    distinction it surfaces: `dispatch` is the ASYNC superstep enqueue
    (should be ~0), while `sync_*` buckets are device->host fetches that
    drain the whole pipeline (each one costs a full tunnel round-trip plus
    every queued superstep's compute)."""

    def __init__(self):
        import collections
        self.t = collections.defaultdict(float)
        self.n = collections.defaultdict(int)
        self._t0 = time.perf_counter()

    def __call__(self, name):
        import contextlib

        @contextlib.contextmanager
        def _cm():
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.t[name] += time.perf_counter() - t0
                self.n[name] += 1
        return _cm()

    def summary(self) -> dict:
        total = time.perf_counter() - self._t0
        tracked = sum(self.t.values())
        out = {k: {"s": round(v, 2), "n": self.n[k]}
               for k, v in sorted(self.t.items(), key=lambda kv: -kv[1])}
        out["_total_wall_s"] = round(total, 2)
        out["_untracked_s"] = round(total - tracked, 2)
        return out


class _CamArraysView:
    """Sequence of CameraArrays built on demand from host Cameras: every
    index/iteration converts the compact (u8/f16) or lazily-decoded storage
    to the f32 device pytree transiently — no whole-scene f32 residency."""

    def __init__(self, cameras):
        self._cams = cameras

    def __len__(self):
        return len(self._cams)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [c.arrays() for c in self._cams[i]]
        return self._cams[i].arrays()

    def __iter__(self):
        return (c.arrays() for c in self._cams)


class _DeviceCamCache:
    """Byte-capped LRU of device-resident COMPACT camera pytrees
    (Camera.compact_arrays). The training loop's camera staging decodes
    these ON DEVICE (cameras.decode_arrays) instead of re-decoding and
    re-uploading ~60 MB of f32 stacks per camera per step through the
    host link — at 1600x1200 that upload dominated the whole step (the
    r4 trainpop rehearsal ran 0.15 it/s host-bound vs a ~10x faster
    chip-bound step). The reference sidesteps this class of cost by
    keeping every tensor CUDA-resident from load (scene/cameras.py:35-46,
    data_device); a DTU-protocol scene (64 cams) is ~1.5 GB compact —
    within cap for one v5e's 16 GB alongside the model."""

    def __init__(self, cameras, cap_bytes: int):
        import collections
        self._cams = cameras
        self._cap = cap_bytes
        self._store = collections.OrderedDict()   # idx -> (nbytes, pytree)
        self._bytes = 0
        self._warned_oversize = False

    def get(self, i: int):
        if i in self._store:
            self._store.move_to_end(i)
            return self._store[i][1]
        compact = self._cams[i].compact_arrays()
        nb = sum(int(x.nbytes) for x in jax.tree.leaves(compact))
        dev = jax.device_put(compact)
        if nb > self._cap:
            # one camera alone exceeds the byte cap: caching it would pin
            # the cache permanently over budget (eviction empties the store
            # and inserts anyway) — hand back the staged copy uncached
            if not self._warned_oversize:
                self._warned_oversize = True
                print(f"[cam-cache] camera {i} is {nb/2**20:.0f} MiB > cap "
                      f"{self._cap/2**20:.0f} MiB; staging uncached "
                      "(raise tpu.cam_cache_mb to cache)", flush=True)
            return dev
        while self._store and self._bytes + nb > self._cap:
            _, (b, _old) = self._store.popitem(last=False)
            self._bytes -= b
        self._store[i] = (nb, dev)
        self._bytes += nb
        return dev


class Trainer:
    """Host-side orchestration (reference Trainer, trainer.py:42-210)."""

    def __init__(self, cfg):
        self.cfg = cfg
        # rasterizer tile edge: set before ANY trace (see K.set_tile; at the
        # 1600-wide protocol shapes tile 32 is 1.69x faster end-to-end)
        from ..ops import rasterize_tpu as _K
        _K.set_tile(int(cfg.tpu.get("tile", 16)))
        _K.set_chunk(int(cfg.tpu.get("chunk", 256)))
        # reference debug hooks (SURVEY.md §5.2): torch anomaly detection ->
        # jax NaN tracing; nsys-style profiling -> the jax.profiler server
        # (point TensorBoard / xprof at it)
        if getattr(cfg, "detect_anomaly", False):
            jax.config.update("jax_debug_nans", True)
        prof_port = int(os.environ.get("VCR_PROFILER_PORT", "0"))
        if prof_port:
            jax.profiler.start_server(prof_port)
            print(f"[profiler] jax.profiler server on :{prof_port}",
                  flush=True)
        w = {k: float(v) for k, v in cfg.optim.loss_weight.items()
             if float(v) > 0}
        self.weights = w
        # derive data-loading flags from the loss recipe (trainer.py:46-53)
        load_normal = ("mono_normal" in w or "depth_normal" in w)
        load_depth = "mono_depth" in w
        load_mask = ("semantic" in w
                     or bool(getattr(cfg.model, "load_mask", False)))

        self.scene = load_scene_info(
            cfg.model.source_path, images_dir=cfg.model.images,
            eval_split=cfg.model.eval, llffhold=cfg.model.llffhold,
            ratio=cfg.model.ratio, use_meta_split=cfg.model.split,
            load_depth=load_depth, load_normal=load_normal,
            load_mask=load_mask, normal_folder=cfg.model.normal_folder,
            depth_folder=cfg.model.depth_folder,
            resolution=cfg.model.resolution,
            data_device=str(getattr(cfg.model, "data_device", "host")))
        info = self.scene
        self.extent = info.radius
        self.trans = np.asarray(info.trans, np.float32)
        self.scale = np.asarray(info.scale, np.float32)

        pts = info.points.astype(np.float32)
        cols = info.colors.astype(np.float32)
        max_init = getattr(cfg.model, "max_init_points", None)
        cap = int(cfg.tpu.capacity) or _auto_capacity(len(pts))
        limit = min(x for x in (max_init, cap) if x)
        if len(pts) > limit:
            print(f"subsampling init cloud {len(pts)} -> {limit}")
            sel = np.random.default_rng(cfg.seed).choice(
                len(pts), limit, replace=False)
            pts, cols = pts[sel], cols[sel]
        ch_sem = cfg.model.ch_sem_feat if w.get("semantic", 0) > 0 else 0
        self.ch_sem = ch_sem
        self.num_cls = cfg.model.num_cls
        self.state = GM.create_from_pcd(pts, cols, cap, cfg.model.sh_degree,
                                        ch_sem)

        cam0 = info.train_cameras[0]
        self.rcfg = RenderConfig(
            width=cam0.width, height=cam0.height, ch_sem=ch_sem,
            depth_mode=cfg.model.depth_type,
            entry_budget=max(1 << 14, cfg.tpu.entry_budget_factor * cap),
            # thr <= 0 disables the depth cut inside render() (reference
            # gates on cfg.optim.mask_depth_thr > 0)
            mask_depth_thr=float(cfg.optim.mask_depth_thr),
            max_sh_degree=cfg.model.sh_degree)
        # Initial entry budget: PROBE the scene's real demand instead of
        # trusting factor*capacity. Every E-wide stage (sort, gathers,
        # segment-sum) runs at the budget's STATIC shape, so a capacity-
        # sized budget under an oversized tpu.capacity made the whole
        # early run pay protocol-scale sorts for a 150k-entry scene
        # (measured ~6.7 s/superstep at 150k gaussians / capacity 2^20,
        # r5 camcache A/B) until the right-sizer's first 200-iter window.
        # num_entries is pre-truncation, so a tiny probe budget suffices;
        # headroom 1.5x (densify growth is handled by overflow 2x-growth
        # and by the right-sizer, same as before).
        if bool(cfg.tpu.get("probe_entry_budget", True)):
            self.rcfg = self.rcfg._replace(
                entry_budget=self._probe_entry_budget())

        # side networks
        rng = jax.random.PRNGKey(cfg.seed)
        app_emb = app_params = app_opt = None
        cls_params = cls_opt = None
        self.app_tx = optax.adam(cfg.optim.appearance_embeddings_lr,
                                 eps=1e-15)
        self.cls_tx = optax.adam(cfg.optim.cls_lr, eps=1e-15)
        if cfg.model.use_decoupled_appearance:
            n_imgs = len(info.train_cameras) + len(info.test_cameras)
            app_emb, app_params = APP.init_appearance(
                rng, n_imgs, cam0.height, cam0.width)
            app_opt = self.app_tx.init((app_emb, app_params))
        if ch_sem:
            clf = APP.SemanticClassifier(cfg.model.num_cls)
            cls_params = clf.init(rng, jnp.zeros((ch_sem, 8, 8)))
            cls_opt = self.cls_tx.init(cls_params)
        self.net = NetState(app_emb, app_params, app_opt, cls_params,
                            cls_opt)

        self.camera_batch = max(int(getattr(cfg.tpu, "camera_batch", 1)), 1)
        self.steps_per_call = max(
            int(getattr(cfg.tpu, "steps_per_call", 1)), 1)
        self.mesh = None
        if self.camera_batch > 1:
            from ..parallel import dp
            mesh_size = min(len(jax.devices()), self.camera_batch)
            if self.camera_batch % mesh_size:
                raise ValueError(
                    f"tpu.camera_batch={self.camera_batch} must be a "
                    f"multiple of the mesh size {mesh_size}")
            self.mesh = dp.data_mesh(mesh_size)
        self._build_step_fn()
        self._densify_fn = jax.jit(functools.partial(
            GM.densify_and_prune,
            grad_threshold=cfg.optim.densify_grad_threshold,
            min_opacity=0.005, scene_extent=self.extent,
            percent_dense=cfg.optim.percent_dense),
            static_argnames=("max_screen_size",))
        self._reset_opacity = jax.jit(GM.reset_opacity)

        self.iteration = 0
        self.viewpoint_stack: list[int] = []
        self.bg = np.array([1, 1, 1] if cfg.model.white_background
                           else [0, 0, 0], np.float32)
        self.rng = random.Random(cfg.seed)
        self.losses_ema: dict[str, float] = {}
        self.history: list[dict] = []
        # lazy CameraArrays view: materializes f32 stacks per access from
        # the compact/lazy host storage instead of caching a second
        # whole-scene f32 copy (reference data_device analog, SURVEY §7.3#7)
        self._cam_arrays = _CamArraysView(info.train_cameras)
        # device-resident compact camera cache (tpu.cam_cache_mb, 0 = off):
        # staging decodes on device instead of uploading f32 stacks per step
        cache_mb = int(cfg.tpu.get("cam_cache_mb", 2048))
        self._cam_cache = (_DeviceCamCache(info.train_cameras,
                                           cache_mb << 20)
                           if cache_mb > 0 else None)
        self._decode_fns = {}         # k -> jitted stack+decode

        os.makedirs(cfg.logdir, exist_ok=True)
        # run metadata the downstream stages reload (scene/__init__.py:61-73)
        cams_json = [camera_to_json(i, c) for i, c in enumerate(
            info.train_cameras + info.test_cameras)]
        with open(os.path.join(cfg.logdir, "cameras.json"), "w") as f:
            json.dump(cams_json, f)
        # legacy 3DGS `cfg_args` Namespace dump (trainer.py:178-179) so
        # upstream-style tooling (arguments.get_combined_args) can locate runs
        from ..compat.arguments import write_cfg_args
        write_cfg_args(cfg, cfg.logdir)

        self.test_history: list[dict] = []
        self._prof = _StageProf()
        self._prefetched = None
        self._bin_aux = None
        self._bin_aux_k = None
        self._staged = None
        self._last_fetch_iter = 0
        self._max_iters = int(cfg.optim.iterations)
        self._entries_peak = 0
        self._entries_window = 0
        self._ovf_dev = None
        self._ne_dev = None
        self._ovf_snapshot = None      # deferred-read window (see
        self._pending_log = None       # _maybe_react_overflow / train)
        self._pending_dropped = None   # deferred densify drop count
        self._tb = _make_tb_writer(cfg.logdir)
        # remote viewer bridge (cfg.port > 0, trainer.py:64-65; unlike the
        # reference — which only wires init — the pump runs, see _gui_pump)
        self._gui = None
        self._gui_paused = False
        self._gui_render_cache: dict = {}
        # jit caches for the non-training sweeps (shared pattern with
        # _gui_pump's per-(W,H) cache): stats scans + eval metric programs
        self._stats_fn_cache: dict = {}
        self._eval_fn_cache: dict = {}
        if int(getattr(cfg, "port", -1) or -1) > 0:
            from ..render.network_gui import NetworkGUI
            self._gui = NetworkGUI(str(getattr(cfg, "ip", "127.0.0.1")),
                                   int(cfg.port))
        # --train.debug_from parity (reference trainer.py:331-332 flips the
        # rasterizer debug flag at iteration N; here: NaN tracing + per-step
        # finite checks from that iteration on)
        self._debug_from = int(getattr(cfg.train, "debug_from", -1))
        self._debug_on = False
        start_ckpt = getattr(cfg.train, "start_checkpoint", None)
        if start_ckpt:
            self.restore_checkpoint(start_ckpt)
            print(f"resumed from {start_ckpt} at iteration {self.iteration}")
            if bool(cfg.tpu.get("probe_entry_budget", True)):
                # the __init__ probe saw the init cloud; a restored model
                # can demand far more entries — re-probe (grow-only: the
                # restored population's demand never shrinks the budget
                # below what the run already right-sized)
                self._set_entry_budget(max(self.rcfg.entry_budget,
                                           self._probe_entry_budget()))

    def _probe_entry_budget(self) -> int:
        """Initial entry budget from a REAL binning probe over <=8 spread
        cameras: peak pre-truncation entry demand x1.5 headroom,
        64k-quantized, capped by the legacy factor*capacity sizing. A
        capacity-sized budget under an oversized tpu.capacity makes every
        E-wide stage (sort/gather/segment-sum) run static shapes up to
        ~50x the scene's true entry count until the right-sizer's first
        200-iter window (~6.7 s/superstep measured at 150k gaussians /
        capacity 2^20, r5 camcache A/B). Densify growth is handled by the
        overflow 2x-growth + right-sizer, unchanged."""
        from ..render.renderer import compute_camera_binning
        probe_rcfg = self.rcfg._replace(entry_budget=1 << 14)
        probe = jax.jit(lambda st, c: compute_camera_binning(
            st, c, probe_rcfg).binn.num_entries)
        cams = self.scene.train_cameras
        idxs = np.unique(np.linspace(0, len(cams) - 1,
                                     min(8, len(cams))).astype(int))
        peak = max(int(probe(self.state, jax.tree.map(
            jnp.asarray, cams[i].arrays(pixels=False)))) for i in idxs)
        q = 1 << 16
        probed = max(q, -(-(peak * 3 // 2) // q) * q)
        cap_budget = max(1 << 14,
                         self.cfg.tpu.entry_budget_factor
                         * self.state.capacity)
        budget = min(cap_budget, probed)
        print(f"[entry budget] probe: peak {peak} over {len(idxs)} cams "
              f"-> {budget} (capacity-sized {cap_budget})", flush=True)
        return budget

    # -- schedule helpers --------------------------------------------------

    def _sh_degree(self, it: int | None = None) -> int:
        """SH warmup: +1 every 1000 iters (trainer.py:402-404)."""
        it = self.iteration if it is None else it
        return min(it // 1000, self.cfg.model.sh_degree)

    def _gates(self, it: int | None = None) -> Gates:
        o = self.cfg.optim
        it = self.iteration if it is None else it
        return Gates(
            mono_normal=it > o.normal_from_iter,
            depth_normal=it > o.dnormal_from_iter,
            curv=it > o.curv_from_iter,
            consistent_normal=it > o.consistent_normal_from_iter,
            close_depth=it > o.close_depth_from_iter)

    def _lr_xyz(self, it: int | None = None):
        o = self.cfg.optim
        it = self.iteration if it is None else it
        return M.expon_lr(it, o.position_lr_init * self.extent,
                          o.position_lr_final * self.extent,
                          max_steps=o.position_lr_max_steps)

    def _next_camera_index(self) -> int:
        if not self.viewpoint_stack:
            self.viewpoint_stack = list(range(len(self._cam_arrays)))
        return self.viewpoint_stack.pop(
            self.rng.randint(0, len(self.viewpoint_stack) - 1))

    def _pick_camera(self) -> CameraArrays:
        """One-slot camera prefetch: the NEXT camera's host->device transfer
        is issued before this step's compute is dispatched, so the (large)
        image upload overlaps the previous step on device."""
        if self._prefetched is None:
            idx = self._next_camera_index()
            self._prefetched = self._fetch_one(idx)
            self._prefetched_idx = idx
        cam = self._prefetched
        idx = self._next_camera_index()
        self._prefetched = self._fetch_one(idx)
        self._prefetched_idx = idx
        return cam

    def _fetch_one(self, idx: int):
        """One camera as a device f32 pytree — decoded on device from the
        compact cache when enabled, else host-decoded + uploaded."""
        if self._cam_cache is not None:
            return self._decode_stack(1, [self._cam_cache.get(idx)],
                                      stacked=False)
        return jax.device_put(self._cam_arrays[idx])

    # -- main loop ----------------------------------------------------------

    def _stage_dp_batch(self):
        """Stack + shard the next camera batch over the mesh (prefetched a
        step ahead so host->device transfer overlaps compute, like the
        single-chip path). Returns (sampled indices, sharded batch) so an
        abandoned prefetch can be requeued."""
        from ..parallel import dp
        idxs = [self._next_camera_index()
                for _ in range(self.camera_batch)]
        batch = dp.shard_camera_batch(
            dp.stack_cameras([self._cam_arrays[i] for i in idxs]), self.mesh)
        return idxs, batch

    def _stage_dp_camera_stack(self, s: int):
        """Sample + stack + shard s camera batches (leaves (s, B, ...),
        sharded over the CAMERA dim) for one DP superstep."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel import dp
        rows = [[self._next_camera_index()
                 for _ in range(self.camera_batch)] for _ in range(s)]
        steps = [dp.stack_cameras([self._cam_arrays[i] for i in row])
                 for row in rows]
        stack = jax.tree.map(lambda *xs: np.stack(xs), *steps)
        sharding = NamedSharding(self.mesh, P(None, "data"))
        flat = [i for row in rows for i in row]
        return flat, jax.tree.map(lambda x: jax.device_put(x, sharding),
                                  stack)

    def _invalidate_binning(self):
        """Drop the lookahead binning (both the single-step and the stacked
        superstep form) after any geometry/shape mutation."""
        self._bin_aux = None
        self._bin_aux_k = None

    def _is_action_iter(self, j: int) -> bool:
        """Does the host act after step j (densify/opacity-reset/prune/test/
        save/checkpoint/final)? Mirrors _post_step_actions + train()'s
        triggers — supersteps must not straddle these."""
        o = self.cfg.optim
        t = self.cfg.train
        if j == int(o.iterations) or j >= self._max_iters:
            return True
        for lst in (t.test_iterations, t.save_iterations,
                    t.checkpoint_iterations, o.prune.iterations):
            if j in list(lst):
                return True
        if j < o.densify_until_iter:
            if j > o.densify_from_iter and j % o.densification_interval == 0:
                return True
            if j % o.opacity_reset_interval == 0 or (
                    self.cfg.model.white_background
                    and j == o.densify_from_iter):
                return True
        return False

    def _multi_window_ok(self, k: int) -> bool:
        """True when iterations [it+1, it+k] can run as ONE superstep: no
        interior host action (the final step it+k MAY have one — it runs
        after the program returns) and constant trace statics (gates and SH
        degree are monotone in the iteration, so endpoint equality implies
        constancy over the window)."""
        it = self.iteration
        if it + k > self._max_iters:
            return False
        if any(self._is_action_iter(j) for j in range(it + 1, it + k)):
            return False
        if not self._debug_on and it < self._debug_from < it + k:
            return False       # debug switch would fall mid-window
        return (self._gates(it + 1) == self._gates(it + k)
                and self._sh_degree(it + 1) == self._sh_degree(it + k))

    def _decode_stack(self, k: int, cams, stacked: bool = True):
        """Jitted device-side stack+decode of k compact camera pytrees
        (zero host->device traffic when they're cache-resident).
        ``stacked=False`` (k==1) returns the bare pytree for the
        single-step path."""
        key = (k, stacked)
        if key not in self._decode_fns:
            from ..data.cameras import decode_arrays

            def _fn(*cs):
                dec = [decode_arrays(c) for c in cs]
                if not stacked:
                    return dec[0]
                return jax.tree.map(lambda *xs: jnp.stack(xs), *dec)
            self._decode_fns[key] = jax.jit(_fn)
        return self._decode_fns[key](*cams)

    def _stage_camera_stack(self, k: int):
        """Sample + stack + decode the next k cameras. With the device
        cache, resident compact copies are stacked+decoded ON DEVICE (no
        per-step upload); otherwise one async host transfer, issued while
        the current superstep computes on device."""
        from ..parallel import dp
        idxs = [self._next_camera_index() for _ in range(k)]
        if self._cam_cache is not None:
            return idxs, self._decode_stack(
                k, [self._cam_cache.get(i) for i in idxs])
        stack = dp.stack_cameras([self._cam_arrays[i] for i in idxs])
        return idxs, jax.device_put(stack)

    def _requeue_staged(self):
        """Un-consume the sampled indices of an abandoned staged superstep
        batch (mode switch around a host event) so epoch sampling stays
        without-replacement; the device arrays are dropped."""
        idxs, _ = self._staged
        self.viewpoint_stack.extend(idxs)
        self._staged = None

    def _train_superstep(self, k: int):
        """k iterations in ONE dispatch (make_multi_train_step): per-step
        dispatch overhead is paid once per k steps. Only taken when
        _multi_window_ok — the host tail then runs once, at the superstep's
        final iteration."""
        it0 = self.iteration
        iters = range(it0 + 1, it0 + k + 1)
        if self._prefetched is not None:
            # return the single-step path's prefetched camera to the epoch
            # pool (mode switch); its device copy is dropped
            if self._prefetched_idx is not None:
                self.viewpoint_stack.append(self._prefetched_idx)
            self._prefetched = None
            self._prefetched_idx = None
        with self._prof("stage_cams"):
            if self._staged is None:
                self._staged = self._stage_camera_stack(k)
            _, cams = self._staged
            self._staged = self._stage_camera_stack(k)  # next superstep's
            _, next_cams = self._staged               # = this one's lookahead
        o = self.cfg.optim
        if o.random_background:
            bgs = np.stack([np.random.default_rng(j).random(3).astype(
                np.float32) for j in iters])
        else:
            bgs = np.broadcast_to(self.bg, (k, 3)).astype(np.float32)
        lrs = np.asarray([self._lr_xyz(j) for j in iters], np.float32)
        self.iteration = it0 + k
        with self._prof("dispatch"):
            self.state, self.net, losses, aux = self._multi_step_fn(
                self.state, self.net, cams, jnp.asarray(bgs),
                jnp.asarray(lrs), sh_degree=self._sh_degree(it0 + 1),
                gates=self._gates(it0 + 1), bin_aux=self._bin_aux_k,
                next_cams=next_cams)
        self._bin_aux_k = aux.pop("next_bin_aux")
        self._accumulate_overflow(aux)
        self._maybe_react_overflow()
        self._post_step_actions()
        self._debug_check(losses)
        return losses, aux

    def _train_dp_superstep(self, s: int):
        """s camera-DP iterations in ONE dispatch: the lax.scan superstep
        body runs INSIDE the shard_map (make_dp_train_step.multi), so
        multi-chip training amortizes per-step dispatch exactly like the
        single-chip path (round-2 weak #3). Camera staging, background/LR
        schedules and the stacked binning lookahead mirror
        _train_superstep."""
        it0 = self.iteration
        iters = range(it0 + 1, it0 + s + 1)
        if self._prefetched is not None:
            # return the single-step path's prefetched batch to the pool
            idxs, _ = self._prefetched
            self.viewpoint_stack.extend(idxs)
            self._prefetched = None
        with self._prof("stage_cams"):
            if self._staged is None:
                self._staged = self._stage_dp_camera_stack(s)
            _, cams = self._staged
            self._staged = self._stage_dp_camera_stack(s)  # next superstep
            _, next_cams = self._staged                  # = this lookahead
        o = self.cfg.optim
        if o.random_background:
            bgs = np.stack([np.random.default_rng(j).random(3).astype(
                np.float32) for j in iters])
        else:
            bgs = np.broadcast_to(self.bg, (s, 3)).astype(np.float32)
        lrs = np.asarray([self._lr_xyz(j) for j in iters], np.float32)
        self.iteration = it0 + s
        with self._prof("dispatch"):
            self.state, self.net, losses, aux = self._step_fn.multi(
                self.state, self.net, cams, jnp.asarray(bgs),
                jnp.asarray(lrs), sh_degree=self._sh_degree(it0 + 1),
                gates=self._gates(it0 + 1), bin_aux=self._bin_aux_k,
                next_cams=next_cams)
        self._bin_aux_k = aux.pop("next_bin_aux")
        self._accumulate_overflow(aux)
        self._maybe_react_overflow()
        self._post_step_actions()
        self._debug_check(losses)
        return losses, aux

    def _maybe_enable_debug(self):
        """Iteration-triggered debug switch (the reference's
        ``(current_iteration - 1) == debug_from`` hook, trainer.py:331-332):
        from iteration debug_from on, jax_debug_nans traces NaN producers
        inside jitted programs and every subsequent step's losses are
        host-checked for finiteness (the fetch serializes async dispatch,
        which is the point — it pins the failing iteration)."""
        if self._debug_on or self._debug_from < 0:
            return
        if self.iteration >= self._debug_from:
            self._debug_on = True
            jax.config.update("jax_debug_nans", True)
            print(f"[debug] NaN tracing + per-step finite checks enabled "
                  f"from iteration {self.iteration}", flush=True)

    def _debug_check(self, losses):
        if not self._debug_on:
            return
        for k, v in losses.items():
            if not np.isfinite(float(v)):
                raise FloatingPointError(
                    f"non-finite loss '{k}' at iteration {self.iteration}")

    def train_step(self):
        self._maybe_enable_debug()
        k = self.steps_per_call
        if k > 1 and self._multi_window_ok(k):
            if self.mesh is None:
                return self._train_superstep(k)
            return self._train_dp_superstep(k)
        if self._staged is not None:
            self._requeue_staged()
        self._bin_aux_k = None
        self.iteration += 1
        if self.mesh is not None:
            # camera prefetch + per-chip binning lookahead in the DP path
            # too (round-1 gap: DP steps paid the in-program sort->gather
            # penalty and had no transfer overlap)
            with self._prof("stage_cams"):
                if self._prefetched is None:
                    self._prefetched = self._stage_dp_batch()
                _, cam = self._prefetched
                self._prefetched = self._stage_dp_batch()
                _, next_cam = self._prefetched
        else:
            with self._prof("stage_cams"):
                cam = self._pick_camera()
            next_cam = self._prefetched      # the lookahead target
        bg = (np.random.default_rng(self.iteration).random(3).astype(
            np.float32) if self.cfg.optim.random_background else self.bg)
        with self._prof("dispatch_single"):
            self.state, self.net, losses, aux = self._step_fn(
                self.state, self.net, cam, jnp.asarray(bg), self._lr_xyz(),
                sh_degree=self._sh_degree(), gates=self._gates(),
                bin_aux=self._bin_aux, next_cam=next_cam)
        # binning lookahead for the next step; invalidated below by any
        # host-side geometry/shape mutation (densify, prune, capacity or
        # entry-budget growth) — opacity resets and SH warmup keep it valid
        self._bin_aux = aux.pop("next_bin_aux", None)

        self._accumulate_overflow(aux)
        self._maybe_react_overflow()
        self._post_step_actions()
        self._debug_check(losses)
        return losses, aux

    def _accumulate_overflow(self, aux):
        """Defer the overflow/entry-count HOST fetch: a per-step bool() fetch
        is a device->host round-trip that serializes async dispatch (and
        rides the control tunnel on this backend). Overflow/num_entries
        accumulate DEVICE-side (lazy | and max, no sync) and are fetched
        every `overflow_check_interval` iterations; an unreacted overflow
        step renders mis-binned but in-bounds (ops/binning.py contract), so
        a bounded reaction delay only costs a few noisy gradients."""
        self._ovf_dev = (aux["overflow"] if self._ovf_dev is None
                         else self._ovf_dev | aux["overflow"])
        self._ne_dev = (aux["num_entries"] if self._ne_dev is None
                        else jnp.maximum(self._ne_dev, aux["num_entries"]))

    def _maybe_react_overflow(self):
        interval = int(getattr(self.cfg.tpu, "overflow_check_interval", 10))
        advance = self.iteration - self._last_fetch_iter
        if advance < interval:
            return
        self._last_fetch_iter = self.iteration
        # ONE-INTERVAL DEFERRED read: snapshot this window's accumulated
        # device flags now, but react on the PREVIOUS window's snapshot.
        # Reading a value produced by the just-dispatched superstep drains
        # the whole async pipeline (the host blocks until the device
        # catches up — on the tunneled backend that exposed the full
        # dispatch round-trip per superstep and was the dominant real-loop
        # overhead, r4 VERDICT weak #4); a snapshot one interval old has
        # long finished computing, so its fetch is a pure host RTT and the
        # dispatch queue stays ~one interval deep. Cost: overflow reaction
        # lags <= 2*interval iterations — the docstring's bounded-delay
        # contract (mis-binned steps stay in-bounds and finite) is
        # unchanged, just with a wider bound.
        snap = (jnp.any(self._ovf_dev), jnp.max(self._ne_dev), advance)
        self._ovf_dev = None
        self._ne_dev = None
        prev, self._ovf_snapshot = self._ovf_snapshot, snap
        if prev is None:
            return
        ovf_dev, ne_dev, advance = prev
        with self._prof("sync_overflow_fetch"):
            # one round-trip for both values (separate bool()/int() fetches
            # cost a tunnel RTT each)
            ovf, peak = jax.device_get((ovf_dev, ne_dev))
            ovf = bool(ovf)
        if ovf:
            self._grow_entry_budget()
            self._invalidate_binning()
            # a fresh full window must pass before any shrink, so a
            # grow->shrink ping-pong needs the per-window peak itself to
            # swing, not just the truncated pre-growth observations
            self._entries_peak = 0
            self._entries_window = 0
            # the snapshot just taken also predates this growth: reacting
            # to it next interval would double-grow on one overflow
            self._ovf_snapshot = None
        else:
            # entry-budget right-sizing: binning cost (sort/gather/
            # segment-sum) scales with the STATIC budget, so re-pin it to
            # the sustained observed peak + 25% headroom, quantized to
            # 64k slots (bounds distinct compiled shapes to a handful per
            # run). Growth on overflow stays 2x; with >=1.25x headroom
            # over a full 200-step window's peak, oscillation requires
            # the scene's true entry demand to swing >25% per window
            self._entries_peak = max(self._entries_peak, int(peak))
            self._entries_window += advance
            if self._entries_window >= 200:
                q = 1 << 16
                target = max(q, -(-(self._entries_peak * 5 // 4) // q) * q)
                # no shrinking while densification is still GROWING the
                # population: demand trends up through the window, so a
                # shrink is guaranteed churn (measured: 6 grow/shrink
                # recompiles in 3000 iters at 1600x1200 while the
                # population tripled — artifacts_r05/proto_loop_3000.log)
                densifying = (self.iteration
                              < self.cfg.optim.densify_until_iter)
                if target < self.rcfg.entry_budget and not densifying:
                    self._set_entry_budget(target)
                    self._invalidate_binning()
                self._entries_peak = 0
                self._entries_window = 0

    def _post_step_actions(self):
        with self._prof("host_actions"):
            self._post_step_actions_inner()

    def _post_step_actions_inner(self):
        o = self.cfg.optim
        it = self.iteration
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                size_thr = 20 if it > o.opacity_reset_interval else None
                box_mask = self._box_densify_mask()
                # deferred drop check (same pattern as the overflow
                # snapshot): fetching `dropped` right after dispatching the
                # densify program drains the pipeline (~1.9 s/densify
                # measured in the r5 rehearsal). React to the PREVIOUS
                # densify's count instead — capacity growth only helps
                # FUTURE densifies either way (this event's overflowing
                # splats are dropped in both orderings), so the semantics
                # are one-event-lagged, not weakened.
                prev_dropped = self._pending_dropped
                self.state, dropped = self._densify_fn(
                    self.state, box_mask=box_mask, max_screen_size=size_thr)
                self._pending_dropped = dropped
                self._invalidate_binning()
                if prev_dropped is not None and int(prev_dropped) > 0:
                    self._grow_capacity(int(prev_dropped))
                    self._pending_dropped = None  # capacity changed: the
                    # in-flight count predates the grow; reacting to it
                    # would double-grow
            if it % o.opacity_reset_interval == 0 or (
                    self.cfg.model.white_background
                    and it == o.densify_from_iter):
                self.state = self._reset_opacity(self.state)
        if it in list(o.prune.iterations):
            self.light_gaussian_prune(
                list(o.prune.iterations).index(it))
            self._invalidate_binning()

    def train(self, max_iters: int | None = None, log_every: int = 50):
        max_iters = max_iters or self.cfg.optim.iterations
        self._max_iters = int(max_iters)   # superstep window bound
        t0 = time.time()
        self._prof = _StageProf()          # fresh stage accounting per run
        last_log = self.iteration
        while self.iteration < max_iters:
            with self._prof("gui"):
                self._gui_pump()
            losses, aux = self.train_step()
            # distance-based boundary: a superstep may jump past an exact
            # `% log_every == 0` iteration
            if (self.iteration - last_log >= log_every
                    or self.iteration == max_iters):
                last_log = self.iteration
                # deferred-by-one-boundary materialization: fetching the
                # just-produced losses drains the dispatch pipeline (same
                # mechanism as the overflow fetch); the previous boundary's
                # values have long landed, so their fetch is a host RTT.
                # stdout/history lag one boundary; values are exact.
                prev_log = self._pending_log
                self._pending_log = (self.iteration, losses, aux,
                                     time.time() - t0)
                if self.iteration == max_iters:
                    self._emit_log(prev_log, max_iters)
                    prev_log, self._pending_log = self._pending_log, None
                self._emit_log(prev_log, max_iters)
            # the final configured iteration is an implicit member of every
            # trigger list (reference `or current_iteration == max_iters`,
            # trainer.py:508,425,428)
            final = self.iteration == int(self.cfg.optim.iterations)
            if final or self.iteration in list(
                    self.cfg.train.test_iterations):
                with self._prof("test_sweeps"):
                    self.run_test()
            if final or self.iteration in list(
                    self.cfg.train.save_iterations):
                with self._prof("save"):
                    self.save()
            if self.iteration in list(self.cfg.train.checkpoint_iterations):
                with self._prof("save"):
                    self.save_checkpoint()
            if final and list(self.cfg.optim.prune.iterations):
                # final per-Gaussian importance dump (imp_score.npz,
                # reference trainer.py:432-436)
                with self._prof("save"):
                    self.save_importance()
        if self._pending_log is not None:     # loop may exit mid-window
            self._emit_log(self._pending_log, max_iters)
            self._pending_log = None
        prof = self._prof.summary()
        print("[prof] " + json.dumps(prof), flush=True)
        return self.history

    def _emit_log(self, entry, max_iters):
        """Materialize + write one deferred log record (train())."""
        if entry is None:
            return
        it, losses, aux, t_rel = entry
        with self._prof("sync_log_fetch"):
            # ONE device_get for the whole record: per-value float()/int()
            # fetches are one tunnel round-trip EACH (~9 RTTs = 195 ms per
            # boundary measured in the r5 warm rehearsal)
            lv, na, ov = jax.device_get((losses, aux["n_active"],
                                         aux["overflow"]))
            rec = {k: float(v) for k, v in lv.items()}
            rec.update(iter=it, n_active=int(na), overflow=bool(ov),
                       time=t_rel)
        with self._prof("log_write"):
            self.history.append(rec)
            self._log_scalars(rec)
            # stdout progress (the reference's tqdm postfix,
            # trainer.py:151): loss + live population
            print(f"[{rec['iter']}/{max_iters}] "
                  f"loss={rec.get('total', float('nan')):.4f} "
                  f"n_active={rec['n_active']}"
                  + (" OVERFLOW" if rec.get("overflow") else ""),
                  flush=True)

    def finalize(self):
        """End-of-training hook (reference finalize(), trainer.py:199-210):
        flush and close the metric writers."""
        if self._tb is not None and hasattr(self._tb, "finish"):
            self._tb.finish()

    def _gui_pump(self):
        """Upstream-3DGS viewer pump: poll the SIBR socket, render the
        requested camera, stream the frame back; a `train: false` message
        pauses training until toggled (the reference wires only init,
        trainer.py:64-65 — this implements the full receive/render loop).

        Per-(W,H) render fns are jit-cached; the scaling-modifier slider is
        folded into log-scales as a device scalar (no recompile per value);
        SH is evaluated at the full configured degree, which is exact at any
        warmup stage because inactive degrees' coefficients are still zero.
        """
        if self._gui is None:
            return
        from ..render.renderer import render as _render
        while True:
            req = self._gui.poll()
            if req is None:
                # A `train: false` message pauses training until the viewer
                # sends train=true or disconnects — poll()==None between
                # viewer frames must NOT silently resume (blocking-receive
                # semantics of the reference's network_gui.receive()).
                if not self._gui_paused or self._gui.conn is None:
                    return
                time.sleep(0.01)
                continue
            self._gui_paused = not req.do_training and req.keep_alive
            if req.camera is not None:
                h, w = req.camera.image.shape[1], req.camera.image.shape[2]
                fn = self._gui_render_cache.get((w, h))
                if fn is None:
                    rcfg = self.rcfg._replace(width=w, height=h, ch_sem=0,
                                              return_normal=False)
                    sh_deg = int(self.cfg.model.sh_degree)
                    ext = float(self.extent)

                    def fn(state, cam, log_sm, _rcfg=rcfg, _deg=sh_deg):
                        p = state.params
                        st = state._replace(params=p._replace(
                            log_scale=p.log_scale + log_sm))
                        out = _render(st, cam, _rcfg, jnp.zeros(3),
                                      sh_degree=_deg, scene_extent=ext)
                        return jnp.clip(out["render"], 0.0, 1.0)

                    fn = jax.jit(fn)
                    self._gui_render_cache[(w, h)] = fn
                cam = jax.tree.map(jnp.asarray, req.camera)
                sm = jnp.log(jnp.maximum(req.scaling_modifier, 1e-6))
                img = fn(self.state, cam, sm)
                self._gui.send_image(np.asarray(img),
                                     self.cfg.model.source_path)
            if req.do_training:
                return
            # paused: keep serving frames until the viewer resumes
            time.sleep(0.01)

    def run_test(self):
        """Periodic full-split eval sweep + image panels (the reference's
        test(), trainer.py:504-587, and log_wandb_images, :452-494):
        PSNR/L1/mIoU over the WHOLE train and test camera lists, one panel
        set per split for the first view, opacity histogram, total points.
        cfg.tpu.eval_max_cams (0 = all) caps the sweep for smoke runs."""
        cap = int(getattr(self.cfg.tpu, "eval_max_cams", 0) or 0)
        res = {"train": self.evaluate(max_cams=cap)}
        test_cams = self.scene.test_cameras
        if test_cams:
            res["test"] = self.evaluate(test_cams, max_cams=cap)
        # image panels for the first view of each split (reference logs the
        # scene.first_name view per split)
        from . import visualization as VZ
        splits = {"train": self._cam_arrays[0]}
        if test_cams:
            splits["test"] = test_cams[0].arrays()
        with_cls = bool(self.ch_sem) and self.net.cls_params is not None
        render_fn = self._full_render_fn(with_cls, self._sh_degree())
        for mode, cam in splits.items():
            out = render_fn(self.state, cam, jnp.asarray(self.bg),
                            self.net.cls_params)
            if mode == "train":
                VZ.save_panels(os.path.join(self.cfg.logdir, "vis"),
                               f"iter_{self.iteration:06d}", out, cam.image,
                               num_cls=self.num_cls if self.ch_sem else 0)
            if self._tb is not None and hasattr(self._tb, "image"):
                panels = VZ.panel_images(
                    out, gt_image=cam.image,
                    gt_normal=cam.normal if bool(cam.has_normal) else None,
                    exp_t=float(self.cfg.optim.exp_t),
                    num_cls=self.num_cls if self.ch_sem else 0,
                    gt_mask=cam.mask if bool(cam.has_mask) else None)
                for suffix, arr in panels.items():
                    tag = f"vis/{mode}" + (f"_{suffix}" if suffix else "")
                    self._tb.image(tag, arr, self.iteration)
        print(f"[ITER {self.iteration}] " + "  ".join(
            f"{k}: psnr={v['psnr']:.2f} l1={v['l1']:.4f}"
            + (f" miou={v['miou']:.3f}" if "miou" in v else "")
            for k, v in res.items()), flush=True)
        if self._tb is not None:
            for split, v in res.items():
                self._tb.scalar(f"eval/{split}_psnr", v["psnr"],
                                self.iteration)
                self._tb.scalar(f"eval/{split}_l1", v["l1"],
                                self.iteration)
                if "miou" in v:
                    self._tb.scalar(f"eval/{split}_miou", v["miou"],
                                    self.iteration)
            self._tb.scalar("scene/total_points",
                            float(self.state.num_active), self.iteration)
            # opacity histogram over the active population (the reference's
            # log_hist, trainer.py:496-502,583)
            if hasattr(self._tb, "histogram"):
                act = np.asarray(self.state.active)
                op = np.asarray(self.state.opacity[:, 0])[act]
                self._tb.histogram("scene/opacity_histogram", op,
                                   self.iteration)
        self.test_history.append({"iter": self.iteration, **res})
        return res

    def _log_scalars(self, rec: dict):
        if self._tb is not None:
            for k, v in rec.items():
                if isinstance(v, float):
                    self._tb.scalar(f"train/{k}", v, rec["iter"])

    def save_checkpoint(self):
        extra = {"net": jax.tree.map(np.asarray, self.net._asdict())}
        ply_io.save_checkpoint(
            os.path.join(self.cfg.logdir, f"chkpnt{self.iteration}.npz"),
            self.state, self.iteration, extra=extra)

    def restore_checkpoint(self, path: str):
        """Resume from a full checkpoint (the reference's
        --train.start_checkpoint, trainer.py:169-172)."""
        self.state, self.iteration, extra = ply_io.load_checkpoint(path)
        self._invalidate_binning()
        if extra.get("net") and any(v is not None
                                    for v in extra["net"].values()):
            self.net = NetState(**extra["net"])

    # -- adaptive buffers (the reference's 22GiB memory guard analog,
    #    gaussian_model.py:588 — here buffers grow with a recompile) ---------

    def _grow_capacity(self, dropped: int):
        """Densification dropped splats: double the padded capacity (bounded
        by cfg.model.max_mem GiB of parameter+moment state)."""
        cap = self.state.capacity
        bytes_per = 4 * 3 * (3 + 3 + 3 * ((self.cfg.model.sh_degree + 1) ** 2
                                          - 1) + 3 + 4 + 1 + self.ch_sem + 3)
        new_cap = cap * 2
        if new_cap * bytes_per > self.cfg.model.max_mem * (1 << 30):
            print(f"[capacity] at max_mem cap ({cap}); densify drops "
                  f"{dropped} splats", flush=True)
            return
        print(f"[capacity] {cap} -> {new_cap} (densify dropped {dropped})",
              flush=True)
        self.state = GM.expand_capacity(self.state, new_cap)
        if not bool(self.cfg.tpu.get("probe_entry_budget", True)):
            # legacy sizing only: re-inflating to factor*new_cap here
            # would undo the startup probe — entry demand tracks the
            # POPULATION, and the overflow 2x-growth + right-sizer adapt
            # the budget to it regardless of capacity
            budget = max(self.rcfg.entry_budget,
                         1 << (new_cap * self.cfg.tpu.entry_budget_factor
                               - 1).bit_length())
            self._set_entry_budget(budget)

    def _grow_entry_budget(self):
        self._set_entry_budget(self.rcfg.entry_budget * 2)

    def _set_entry_budget(self, budget: int):
        if budget == self.rcfg.entry_budget:
            return
        print(f"[entry budget] -> {budget}", flush=True)
        self.rcfg = self.rcfg._replace(entry_budget=budget)
        self._build_step_fn()

    def _build_step_fn(self):
        args = (self.cfg, self.rcfg, self.weights, self.extent, self.trans,
                self.scale, self.cfg.model.num_cls, self.app_tx, self.cls_tx)
        self._multi_step_fn = None
        if self.mesh is not None:
            self._step_fn = make_dp_train_step(*args, mesh=self.mesh)
        else:
            self._step_fn = make_train_step(*args)
            if self.steps_per_call > 1:
                self._multi_step_fn = make_multi_train_step(
                    *args, k=self.steps_per_call)

    # -- batched per-Gaussian stats sweeps ------------------------------------

    def _stats_sweep(self, cam_arrays: list, rcfg) -> tuple:
        """Accumulated per-Gaussian (count, importance) over a camera list,
        chunked into lax.scan programs (the reference's prune_list renders
        per camera in an eager Python loop, tools/prune.py:25-47 — at
        protocol scale that is hundreds of per-camera dispatches; here one
        jit-cached program sweeps a whole chunk on device). Pad cameras
        carry weight 0 so the chunk shape (and compile) is reused."""
        chunk = min(int(getattr(self.cfg.tpu, "stats_chunk", 64)),
                    max(len(cam_arrays), 1))
        fn = self._stats_fn_cache.get((rcfg, chunk))
        if fn is None:
            def scan_fn(state, cams, wts, bg, _rcfg=rcfg):
                def body(acc, xs):
                    cam, wt = xs
                    c, i = render_stats(state, cam, _rcfg, bg)
                    return (acc[0] + wt * c, acc[1] + wt * i), None
                init = (jnp.zeros((state.capacity,), jnp.float32),
                        jnp.zeros((state.capacity,), jnp.float32))
                acc, _ = jax.lax.scan(body, init, (cams, wts))
                return acc
            fn = jax.jit(scan_fn)
            self._stats_fn_cache[(rcfg, chunk)] = fn
        from ..parallel import dp
        bg = jnp.asarray(self.bg)
        count = jnp.zeros((self.state.capacity,), jnp.float32)
        imp = jnp.zeros_like(count)
        for s in range(0, len(cam_arrays), chunk):
            batch = list(cam_arrays[s:s + chunk])
            wts = np.ones(chunk, np.float32)
            if len(batch) < chunk:
                wts[len(batch):] = 0.0
                batch = batch + [batch[-1]] * (chunk - len(batch))
            c, i = fn(self.state, dp.stack_cameras(batch),
                      jnp.asarray(wts), bg)
            count, imp = count + c, imp + i
        return count, imp

    def _full_stats_cams(self) -> list:
        """getFullCameras() analog — train + test cameras (the reference
        accumulates importance over the full list, trainer.py:377-380),
        geometry-only (the stats kernels never read camera pixels)."""
        cams = list(self.scene.train_cameras) + list(self.scene.test_cameras)
        return [c.arrays(pixels=False) for c in cams]

    # -- box-guided densification (trainer.py:361-368, 687-702) --------------

    def get_visi_mask_acc(self, n: int, up: bool, around: bool,
                          sample_mode: str = "random"):
        """Per-Gaussian visibility from cameras sampled on the scene box
        (get_visi_mask_acc, trainer.py:687-702): accumulate stats-kernel hit
        counts over the sampled views; visible & inside-box."""
        from ..data.box_cameras import sample_box_cameras
        if getattr(self.cfg.optim.densify_large.sample_cams, "random", True):
            size = int(getattr(self.cfg.tpu, "visi_resolution", 512))
            cams = sample_box_cameras(
                n, self.trans, self.scale, up=up, around=around,
                sample_mode=sample_mode, size=size, seed=self.iteration)
            rcfg_v = self.rcfg._replace(width=size, height=size, ch_sem=0)
        else:
            cams = [self.scene.train_cameras[self.rng.randint(
                0, len(self.scene.train_cameras) - 1)].arrays(pixels=False)
                for _ in range(n)]
            rcfg_v = self.rcfg
        count, _ = self._stats_sweep(cams, rcfg_v)
        visi = count > 0
        inside, _ = M.get_inside_normalized(
            self.state.params.xyz, jnp.asarray(self.trans),
            jnp.asarray(self.scale))
        return visi & inside

    def _box_densify_mask(self):
        """The densify_large gate (gaussian_model.py:588-596): large inside
        visible gaussians are force-split regardless of gradients."""
        o = self.cfg.optim
        dl = getattr(o, "densify_large", None)
        if not dl or float(getattr(dl, "percent_dense", 0) or 0) <= 0:
            return None
        sc = dl.sample_cams
        if int(getattr(sc, "num", 0)) <= 0:
            return None
        visi = self.get_visi_mask_acc(int(sc.num), bool(sc.up),
                                      bool(sc.around), sample_mode="random")
        large = jnp.max(self.state.scaling, -1) > (
            float(dl.percent_dense) * self.extent)
        return visi & large

    # -- LightGaussian prune (trainer.py:376-385) ----------------------------

    def light_gaussian_prune(self, prune_round: int):
        """Importance accumulated over the FULL camera list — train + test,
        the reference's getFullCameras() (trainer.py:377-380) — in batched
        scan sweeps rather than one dispatch per camera."""
        o = self.cfg.optim.prune
        _, imp = self._stats_sweep(self._full_stats_cams(), self.rcfg)
        v = GM.v_imp_score(self.state, imp, o.v_pow)
        self.state = GM.prune_by_importance(
            self.state, v, (o.decay ** prune_round) * o.percent)

    # -- persistence ---------------------------------------------------------

    def save(self):
        out = os.path.join(self.cfg.logdir, "point_cloud",
                           f"iteration_{self.iteration}")
        os.makedirs(out, exist_ok=True)
        ply_io.save_gaussian_ply(self.state,
                                 os.path.join(out, "point_cloud.ply"))
        inside, _ = M.get_inside_normalized(
            self.state.params.xyz, jnp.asarray(self.trans),
            jnp.asarray(self.scale))
        ply_io.save_inside_ply(
            self.state, os.path.join(out, "point_cloud_inside.ply"),
            np.asarray(inside))
        if bool(getattr(self.cfg.train, "save_splat", False)):
            ply_io.save_splat(self.state, os.path.join(out, "pcd.splat"))
        # side networks next to the PLY (the reference's model.pth,
        # gaussian_model.py:313-320)
        side = {}
        if self.net.app_params is not None:
            side["appearance"] = (self.net.app_embeddings,
                                  self.net.app_params)
        if self.net.cls_params is not None:
            side["classifier"] = self.net.cls_params
        if side:
            import pickle
            flat = pickle.dumps(jax.tree.map(np.asarray, side))
            with open(os.path.join(out, "model.pkl"), "wb") as f:
                f.write(flat)

    def save_importance(self):
        """Final per-Gaussian importance dump (the reference's
        imp_score.npz, trainer.py:432-436) over the full train+test list."""
        _, imp = self._stats_sweep(self._full_stats_cams(), self.rcfg)
        v = GM.v_imp_score(self.state, imp, self.cfg.optim.prune.v_pow)
        np.savez(os.path.join(self.cfg.logdir, "imp_score.npz"),
                 np.asarray(v))

    # -- evaluation sweep (trainer.py:504-587) -------------------------------


    def _full_render_fn(self, with_classifier: bool, sh_degree: int):
        """Jit-cached full render() for the panel/eval paths (same pattern
        as _gui_pump's per-(W,H) cache) — the eager facade is dozens of
        dispatches per camera on the tunneled backend."""
        key = ("full", self.rcfg, with_classifier, sh_degree)
        fn = self._eval_fn_cache.get(key)
        if fn is not None:
            return fn
        rcfg = self.rcfg
        ext = float(self.extent)
        num_cls = self.num_cls

        def go(state, cam, bg, cls_params):
            classifier = None
            if with_classifier:
                clf = APP.SemanticClassifier(num_cls)
                classifier = lambda f: clf.apply(cls_params, f)
            return render(state, cam, rcfg, bg, sh_degree,
                          scene_extent=ext, classifier=classifier)

        fn = jax.jit(go)
        self._eval_fn_cache[key] = fn
        return fn

    def _eval_metrics_fn(self, with_classifier: bool, sh_degree: int):
        """One jit-cached program per (rcfg, classifier, sh_degree): render a
        camera and reduce to scalar metrics ON DEVICE — the eager op-by-op
        sweep fetched a full image per camera (23 MB at protocol res through
        the tunnel); this fetches three scalars + a num_cls^2 vector."""
        key = (self.rcfg, with_classifier, sh_degree)
        fn = self._eval_fn_cache.get(key)
        if fn is not None:
            return fn
        rcfg = self.rcfg
        ext = float(self.extent)
        num_cls = self.num_cls

        def metrics(state, cam, bg, cls_params):
            classifier = None
            if with_classifier:
                clf = APP.SemanticClassifier(num_cls)
                classifier = lambda f: clf.apply(cls_params, f)
            out = render(state, cam, rcfg, bg, sh_degree,
                         scene_extent=ext, classifier=classifier)
            img = jnp.clip(out["render"], 0, 1)
            mse = jnp.mean((img - cam.image) ** 2)
            res = {"psnr": -10.0 * jnp.log10(mse + 1e-12),
                   "l1": L.l1_loss(img, cam.image)}
            if with_classifier:
                # confusion-matrix row (JaccardIndex.update analog,
                # reference trainer.py:530,569-577); zero when the camera
                # carries no mask
                pred = jnp.argmax(out["render_sem"], axis=0)
                gt = jnp.clip(cam.mask, 0, num_cls - 1)
                idx = (gt * num_cls + pred).ravel()
                conf = jnp.zeros((num_cls * num_cls,), jnp.int32
                                 ).at[idx].add(1)
                res["conf"] = jnp.where(cam.has_mask, conf, 0)
            return res

        fn = jax.jit(metrics)
        self._eval_fn_cache[key] = fn
        return fn

    def evaluate(self, cameras: list[Camera] | None = None,
                 max_cams: int = 0) -> dict:
        """PSNR/L1 (+ mIoU when semantics are on) over a camera list.
        max_cams=0 sweeps every camera (the reference's full-split test(),
        trainer.py:504-587). Renders + metric reductions run as ONE
        jit-cached program per camera; device results are fetched only
        after the whole sweep is dispatched (async pipelining)."""
        cams = (cameras if cameras is not None
                else self.scene.train_cameras)
        if max_cams:
            cams = cams[:max_cams]
        with_cls = bool(self.ch_sem) and self.net.cls_params is not None
        fn = self._eval_metrics_fn(with_cls, self._sh_degree())
        bg = jnp.asarray(self.bg)
        outs = []
        for cam in cams:
            arr = cam.arrays() if isinstance(cam, Camera) else cam
            outs.append(fn(self.state, arr, bg, self.net.cls_params))
        psnrs = [float(o["psnr"]) for o in outs]
        l1s = [float(o["l1"]) for o in outs]
        res = {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))}
        if with_cls:
            conf = np.sum([np.asarray(o["conf"], np.int64) for o in outs],
                          axis=0).reshape(self.num_cls, self.num_cls)
            if conf.sum() > 0:
                inter = np.diag(conf).astype(np.float64)
                union = conf.sum(0) + conf.sum(1) - np.diag(conf)
                present = union > 0
                res["miou"] = float(
                    (inter[present] / union[present]).mean())
        return res


class _TB:
    """Minimal TensorBoard scalar writer (the reference's optional
    SummaryWriter, trainer.py:35-39)."""

    def __init__(self, writer):
        self._w = writer

    def scalar(self, tag, value, step):
        with self._w.as_default():
            import tensorflow as tf
            tf.summary.scalar(tag, value, step=step)

    def histogram(self, tag, values, step):
        with self._w.as_default():
            import tensorflow as tf
            tf.summary.histogram(tag, values, step=step)

    def image(self, tag, arr_hwc, step):
        with self._w.as_default():
            import tensorflow as tf
            tf.summary.image(tag, np.asarray(arr_hwc)[None], step=step)

    def finish(self):
        self._w.flush()


class _Wandb:
    """wandb scalar writer with run naming + wandb_id.txt resume, matching
    the reference's init (trainer.py:98-136). Gated: constructed only when
    the wandb package is importable and --wandb / VCR_WANDB=1 is set."""

    def __init__(self, logdir: str):
        import wandb
        self._wandb = wandb
        id_file = os.path.join(logdir, "wandb_id.txt")
        if os.path.exists(id_file):
            run_id = open(id_file).read().strip()
            resume = "must"
        else:
            run_id = wandb.util.generate_id()
            with open(id_file, "w") as f:
                f.write(run_id)
            resume = "allow"
        parts = os.path.normpath(logdir).split(os.sep)
        wandb.init(project=os.environ.get("WANDB_PROJECT", "vcr_gaus_tpu"),
                   group=parts[-2] if len(parts) > 1 else None,
                   name=parts[-1], id=run_id, resume=resume, dir=logdir)

    def scalar(self, tag, value, step):
        self._wandb.log({tag: value}, step=step)

    def histogram(self, tag, values, step):
        self._wandb.log({tag: self._wandb.Histogram(np.asarray(values))},
                        step=step)

    def image(self, tag, arr_hwc, step):
        """Image panels (the reference's log_wandb_images,
        trainer.py:452-494)."""
        self._wandb.log({tag: self._wandb.Image(np.asarray(arr_hwc))},
                        step=step)

    def finish(self):
        self._wandb.finish()


def _make_tb_writer(logdir: str):
    """Metric writer chain: wandb primary (reference trainer.py:98-136,
    gated on the package + opt-in), TensorBoard secondary (trainer.py:35-39,
    VCR_TB=1)."""
    writers = []
    if os.environ.get("VCR_WANDB", "0") == "1":
        try:
            writers.append(_Wandb(logdir))
        except Exception as e:
            print(f"[wandb] disabled: {e}", flush=True)
    if os.environ.get("VCR_TB", "0") == "1":
        try:
            import tensorflow as tf
            writers.append(_TB(tf.summary.create_file_writer(
                os.path.join(logdir, "tb"))))
        except Exception:
            pass
    if not writers:
        return None
    if len(writers) == 1:
        return writers[0]

    class _Multi:
        def scalar(self, tag, value, step):
            for w in writers:
                w.scalar(tag, value, step)

        def histogram(self, tag, values, step):
            for w in writers:
                if hasattr(w, "histogram"):
                    w.histogram(tag, values, step)

        def image(self, tag, arr_hwc, step):
            for w in writers:
                if hasattr(w, "image"):
                    w.image(tag, arr_hwc, step)

        def finish(self):
            for w in writers:
                if hasattr(w, "finish"):
                    w.finish()
    return _Multi()


def _auto_capacity(n_init: int) -> int:
    """Fixed padded capacity: the next power of two above 8x the init count
    (the densify-growth envelope seen on the reference benchmarks), min 2^16."""
    return max(1 << 16, 1 << math.ceil(math.log2(max(n_init, 1) * 8)))
