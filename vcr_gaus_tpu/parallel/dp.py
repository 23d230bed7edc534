"""Multi-chip parallelism: camera data-parallel training over a device mesh.

The reference's only multi-device mode is share-nothing scene dispatch
(python_scripts/run_base.py:13-43, one scene per GPU). The TPU-native
equivalents here (SURVEY.md §5.8):

  * **scene-DP**: one scene per chip — trivially `scene_dispatch` below,
    no collectives (matching the reference),
  * **camera-DP** (stretch, ICI collectives): a camera minibatch sharded over
    the mesh's ``data`` axis, gradients `pmean`-ed across chips before the
    replicated Adam update. Expressed with `shard_map` so each chip runs the
    single-camera Pallas raster step locally and only the (C, F) gradient
    pytree rides the ICI.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..data.cameras import CameraArrays
from ..models import gaussians as GM
from ..render.renderer import RenderConfig, render
from ..train import losses as L


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def stack_cameras(cams: list[CameraArrays]) -> CameraArrays:
    return jax.tree.map(lambda *xs: np.stack(xs), *cams)


def make_camera_dp_step(rcfg: RenderConfig, mesh: Mesh,
                        weights: dict | None = None,
                        scene_extent: float = 1e9, axis: str = "data"):
    """Jitted data-parallel train step: state replicated, camera batch
    sharded over ``axis``; per-chip gradients are pmean-ed (XLA all-reduce
    over ICI), then the replicated Adam update keeps state identical on all
    chips. Batch size must equal mesh size (1 camera per chip)."""
    weights = weights or {"l1": 0.8, "ssim": 0.2}

    def local_step(state: GM.GaussianState, cam_batch: CameraArrays,
                   bg, lr_xyz):
        cam = jax.tree.map(lambda x: x[0], cam_batch)   # local shard = 1 cam

        def loss_fn(params):
            st = state._replace(params=params)
            out = render(st, cam, rcfg, bg, sh_degree=0,
                         scene_extent=scene_extent)
            total = weights.get("l1", 0) * L.l1_loss(out["render"], cam.image)
            if weights.get("ssim", 0):
                total += weights["ssim"] * (1 - L.ssim(out["render"],
                                                       cam.image))
            return total

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, axis)              # ICI all-reduce
        loss = jax.lax.pmean(loss, axis)
        grads = GM.mask_grads(grads, state.active)
        lrs = GM.LearningRates(xyz=lr_xyz, f_dc=0.0025, f_rest=0.0025 / 20,
                               opacity=0.05, scaling=0.005, rotation=0.001,
                               obj_dc=0.0025)
        new_state = GM.adam_step(state, grads, lrs)
        return new_state, loss

    from jax import shard_map
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def shard_camera_batch(cams: CameraArrays, mesh: Mesh, axis: str = "data"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), cams)


def replicate(tree: Any, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding),
                        tree)


def scene_dispatch(scene_fns: list, mesh: Mesh | None = None,
                   devices: list | None = None, parallel: bool = False):
    """Share-nothing scene parallelism (the reference's dispatch_jobs,
    python_scripts/run_base.py:13-43 — one scene per GPU from a pool).

    Sequential mode (default): scene i's closure runs pinned to device
    i % n via ``jax.default_device``. Parallel mode: closures run in a
    thread pool with devices acquired from a queue — the exact analog of
    the reference's GPUtil pool. ``jax.default_device`` is thread-local
    config state and device execution releases the GIL, so concurrent
    scenes genuinely overlap on distinct chips."""
    devs = list(devices) if devices is not None else jax.devices()
    if not parallel:
        results = []
        for i, fn in enumerate(scene_fns):
            with jax.default_device(devs[i % len(devs)]):
                results.append(fn())
        return results

    import queue
    from concurrent.futures import ThreadPoolExecutor
    pool: queue.Queue = queue.Queue()
    for d in devs:
        pool.put(d)

    def run(fn):
        d = pool.get()
        try:
            with jax.default_device(d):
                return fn()
        finally:
            pool.put(d)

    with ThreadPoolExecutor(max_workers=len(devs)) as ex:
        futs = [ex.submit(run, fn) for fn in scene_fns]
        return [f.result() for f in futs]
