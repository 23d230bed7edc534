#!/usr/bin/env python
"""ScanNet++ multi-scene pipeline — the multi-chip scene-data-parallel
configuration (BASELINE.md stretch; reference has only the recipe yaml,
configs/scannetpp/base.yaml, and runs scenes one-per-GPU via the
python_scripts/run_base.py pool).

TPU-native scene dispatch: one scene per chip, share-nothing (the
reference's process-level model, SURVEY.md §5.8). Each worker subprocess is
pinned to its chip via TPU_VISIBLE_CHIPS / JAX_DEFAULT_DEVICE; on single-chip
or CPU hosts the scenes just run sequentially.

  python scripts/run_scannetpp.py --data_root data/scannetpp \\
      [--scenes 0a5c013435 ...] [--parallel 4] [--dry]

Per scene: train -> mesh (voxel 1.5e-2 per the recipe) -> NVS metrics;
aggregates mean PSNR like the reference's show_* scripts.

Two dispatch modes:
  --parallel N     one subprocess per scene, pinned to a chip from a pool
                   of N via TPU_VISIBLE_CHIPS (the reference's
                   process-level model);
  --in_process N   all scenes train inside THIS process, one scene per
                   jax device over the first N devices, concurrently via
                   parallel.dp.scene_dispatch (TPU-native: one runtime,
                   per-scene default_device pinning). Mesh/eval stages
                   still chain as subprocesses afterwards. Testable on the
                   virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
                   device_count=8 JAX_PLATFORMS=cpu).

Unrecognized dotted flags (--a.b=c) pass through to the train stage.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage_cmds(py, scene, src, logdir, iterations=None, overrides=(),
               skip_train=False, voxel_size=0.015):
    train = [py, "train.py", "--config=configs/scannetpp/base.yaml",
             f"--model.source_path={src}", f"--logdir={logdir}"]
    if iterations:
        train.append(f"--optim.iterations={iterations}")
    train += list(overrides)
    mesh = [py, "depth2mesh.py", f"--cfg_path={logdir}/config.yaml",
            f"--voxel_size={voxel_size}"]
    eval_ = [py, "render_eval.py", f"--cfg_path={logdir}/config.yaml"]
    return ([mesh, eval_] if skip_train else [train, mesh, eval_])


def train_scenes_in_process(jobs, iterations, n_devices, overrides):
    """Train every scene inside this process, one scene per jax device over
    the first ``n_devices`` devices, concurrently (dp.scene_dispatch with a
    device pool — the TPU-native replacement for one-subprocess-per-chip).
    Returns {scene: ok}."""
    sys.path.insert(0, REPO)
    import jax

    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.parallel import dp
    from vcr_gaus_tpu.train.trainer import Trainer
    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    def make(scene, src, logdir):
        def fn():
            try:
                ovr = [f"--model.source_path={src}", f"--logdir={logdir}"]
                if iterations:
                    ovr.append(f"--optim.iterations={iterations}")
                cfg = Config(os.path.join(
                    REPO, "configs/scannetpp/base.yaml"),
                    overrides=ovr + list(overrides))
                os.makedirs(logdir, exist_ok=True)
                cfg.save(os.path.join(logdir, "config.yaml"))
                trainer = Trainer(cfg)
                trainer.train()
                trainer.save()
                dev = next(iter(trainer.state.params.xyz.devices()))
                print(f"[{scene}] trained in-process on device {dev}",
                      flush=True)
                # check_finish gate (run_base.py:46-50)
                if not os.path.isdir(os.path.join(logdir, "point_cloud")):
                    print(f"[{scene}] check_finish: no point_cloud/",
                          flush=True)
                    return False
                return True
            except Exception as e:                      # noqa: BLE001
                print(f"[{scene}] TRAIN FAILED in-process: {e!r}",
                      flush=True)
                return False
        return fn

    devs = jax.devices()[:n_devices]
    # The rasterizer tile/chunk knobs (rasterize_tpu.set_tile/set_chunk)
    # are PROCESS-GLOBAL and clear trace caches when changed; concurrent
    # Trainers are safe only because every in-process scene shares one
    # config (the setters early-return on equal values). Pin the knobs
    # once here, before any trainer thread races, and reject heterogeneous
    # per-scene kernel knobs up front.
    from vcr_gaus_tpu.ops import rasterize_tpu as _K
    shared = Config(os.path.join(REPO, "configs/scannetpp/base.yaml"),
                    overrides=list(overrides))
    _K.set_tile(int(shared.tpu.get("tile", 16)))
    _K.set_chunk(int(shared.tpu.get("chunk", 256)))
    print(f"in-process scene-DP over {len(devs)} devices: "
          f"{[d.id for d in devs]} (kernel knobs pinned: tile={_K.TILE} "
          f"chunk={_K.G}, process-global)", flush=True)
    t0 = time.time()
    oks = dp.scene_dispatch([make(*j) for j in jobs], devices=devs,
                            parallel=True)
    print(f"in-process train phase: {len(jobs)} scenes in "
          f"{time.time() - t0:.1f}s", flush=True)
    return {j[0]: ok for j, ok in zip(jobs, oks)}


def run_scene(py, scene, src, logdir, iterations, dry, chip_pool=None,
              overrides=(), skip_train=False, voxel_size=0.015):
    """Run one scene's stages, holding a chip from the pool for the whole
    scene. Chips are acquired dynamically (not pinned by scene index):
    with static `i % parallel` pinning, a freed executor thread could pick
    up scene i+parallel while scene i still runs, co-scheduling two JAX
    subprocesses on one chip."""
    env = dict(os.environ)
    chip = None
    if chip_pool is not None:
        chip = chip_pool.get()
        # both spellings; the active TPU runtime picks up whichever it honors
        env["TPU_VISIBLE_CHIPS"] = str(chip)
        env["TPU_VISIBLE_DEVICES"] = str(chip)
    try:
        for cmd in stage_cmds(py, scene, src, logdir, iterations,
                              overrides, skip_train, voxel_size):
            print(f"[{scene}] +", " ".join(cmd), flush=True)
            if dry:
                continue
            r = subprocess.run(cmd, cwd=REPO, env=env)
            if r.returncode != 0:
                print(f"[{scene}] stage failed ({r.returncode}); "
                      "aborting scene", flush=True)
                return False
            # check_finish gates (run_base.py:46-50)
            if cmd[1] == "train.py" and not os.path.isdir(
                    os.path.join(logdir, "point_cloud")):
                print(f"[{scene}] check_finish: no point_cloud/", flush=True)
                return False
        return True
    finally:
        if chip_pool is not None:
            chip_pool.put(chip)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out", default="output/scannetpp")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="default: every subdirectory of data_root")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--parallel", type=int, default=0,
                    help="concurrent scenes, one per chip (0 = sequential)")
    ap.add_argument("--voxel_size", type=float, default=0.015,
                    help="TSDF voxel (recipe default 1.5e-2)")
    ap.add_argument("--in_process", type=int, default=0, metavar="N",
                    help="train all scenes inside this process over the "
                         "first N jax devices (dp.scene_dispatch), then "
                         "chain mesh/eval subprocesses")
    ap.add_argument("--dry", action="store_true")
    # unrecognized dotted overrides (--a.b=c) pass through to train
    args, overrides = ap.parse_known_args()
    bad = [o for o in overrides if not o.startswith("--")]
    if bad:
        ap.error(f"unrecognized arguments: {bad}")

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    py = sys.executable

    jobs = [(scene, os.path.join(args.data_root, scene),
             os.path.join(args.out, scene)) for scene in scenes]

    if args.in_process > 0 and not args.dry:
        trained = train_scenes_in_process(jobs, args.iterations,
                                          args.in_process, overrides)
        ok = {}
        for s, src, ld in jobs:        # mesh/eval chain per trained scene
            ok[s] = trained.get(s, False) and run_scene(
                py, s, src, ld, args.iterations, args.dry,
                overrides=overrides, skip_train=True,
                voxel_size=args.voxel_size)
    elif args.parallel > 1 and not args.dry:
        import queue
        from concurrent.futures import ThreadPoolExecutor
        chip_pool: queue.Queue = queue.Queue()
        for chip in range(args.parallel):
            chip_pool.put(chip)
        with ThreadPoolExecutor(max_workers=args.parallel) as ex:
            futs = {ex.submit(run_scene, py, s, src, ld, args.iterations,
                              args.dry, chip_pool, overrides, False,
                              args.voxel_size): s
                    for s, src, ld in jobs}
            ok = {futs[f]: f.result() for f in futs}
    else:
        ok = {s: run_scene(py, s, src, ld, args.iterations, args.dry,
                           overrides=overrides, voxel_size=args.voxel_size)
              for s, src, ld in jobs}

    results = {}
    for scene, _, logdir in jobs:
        for root, _, files in os.walk(logdir):
            if "results.json" in files:
                with open(os.path.join(root, "results.json")) as f:
                    results[scene] = json.load(f)
    out = {"per_scene": results, "ok": ok}
    if results:
        out["mean_psnr"] = (sum(r.get("PSNR", 0) for r in results.values())
                            / len(results))
    print(json.dumps(out, indent=2, default=str))


if __name__ == "__main__":
    main()
