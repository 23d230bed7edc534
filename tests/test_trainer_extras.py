"""Trainer with the full extras: decoupled appearance + semantic head, and
the Blender (NeRF-synthetic) reader path."""

import json
import os

import numpy as np
import pytest

from fixtures import write_colmap_scene
from vcr_gaus_tpu.config import Config


def test_trainer_with_appearance_and_semantic(tmp_path):
    from vcr_gaus_tpu.train.trainer import Trainer
    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=4, n_pts=200, width=64, height=64,
                       with_priors=True)
    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = root
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.model.use_decoupled_appearance = True
    c.model.ch_sem_feat = 2
    c.model.num_cls = 2
    c.optim.loss_weight.semantic = 0.005
    c.tpu.capacity = 512
    tr = Trainer(c)
    assert tr.net.app_params is not None
    assert tr.net.cls_params is not None
    emb0 = np.asarray(tr.net.app_embeddings).copy()
    for _ in range(8):
        losses, aux = tr.train_step()
    assert np.isfinite(float(losses["total"]))
    assert "semantic" in losses
    assert 0 <= float(losses["semantic"]) <= 1.0
    # appearance embeddings + classifier actually train
    assert np.abs(np.asarray(tr.net.app_embeddings) - emb0).max() > 0
    # saving writes the side networks too
    tr.save()
    out = os.path.join(c.logdir, "point_cloud",
                       f"iteration_{tr.iteration}", "model.pkl")
    assert os.path.exists(out)

    # full-sweep eval computes semantic mIoU (reference test(),
    # trainer.py:530,569-577) and streams image panels to the writer chain
    class StubWriter:
        def __init__(self):
            self.scalars, self.images, self.hists = {}, {}, []
            self.finished = False

        def scalar(self, tag, value, step):
            self.scalars[tag] = value

        def histogram(self, tag, values, step):
            self.hists.append(tag)

        def image(self, tag, arr, step):
            self.images[tag] = np.asarray(arr).shape

        def finish(self):
            self.finished = True

    stub = StubWriter()
    tr._tb = stub
    res = tr.run_test()
    assert "miou" in res["train"], res
    assert 0.0 <= res["train"]["miou"] <= 1.0
    assert "eval/train_miou" in stub.scalars
    assert "eval/train_psnr" in stub.scalars
    assert "scene/total_points" in stub.scalars
    # panel images: rgb strip, depth, normal, semantic all logged
    assert "vis/train" in stub.images
    assert "vis/train_depth" in stub.images
    assert "vis/train_normal" in stub.images
    assert "vis/train_sem" in stub.images
    assert "scene/opacity_histogram" in stub.hists
    tr.finalize()
    assert stub.finished


def test_final_iteration_hooks(tmp_path):
    """The last configured iteration implicitly triggers test/save and the
    imp_score.npz importance dump (reference trainer.py:425-436,508)."""
    from vcr_gaus_tpu.train.trainer import Trainer
    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=3, n_pts=150, width=48, height=32)
    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = root
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.tpu.capacity = 256
    c.optim.iterations = 12
    c.optim.densify_from_iter = 10_000
    c.optim.prune.iterations = [8]   # non-empty => importance dump at end
    c.train.test_iterations = []
    c.train.save_iterations = []
    tr = Trainer(c)
    tr.train(log_every=6)
    assert os.path.exists(os.path.join(c.logdir, "imp_score.npz"))
    imp = np.load(os.path.join(c.logdir, "imp_score.npz"))["arr_0"]
    assert imp.shape[0] == tr.state.capacity
    # implicit final-iteration test + save despite empty trigger lists
    assert tr.test_history and tr.test_history[-1]["iter"] == 12
    assert os.path.isdir(os.path.join(
        c.logdir, "point_cloud", "iteration_12"))


def test_debug_from_enables_nan_tracing(tmp_path):
    """--train.debug_from parity (reference trainer.py:331-332): from the
    configured iteration the trainer turns on jax_debug_nans and host-checks
    every step's losses for finiteness."""
    import jax

    from vcr_gaus_tpu.train.trainer import Trainer
    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=3, n_pts=150, width=48, height=32)
    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = root
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.tpu.capacity = 256
    c.optim.densify_from_iter = 10_000
    c.train.debug_from = 2
    tr = Trainer(c)
    try:
        tr.train_step()
        assert not tr._debug_on           # iteration 1 < debug_from
        tr.train_step()                   # enables at iteration >= 2
        tr.train_step()
        assert tr._debug_on
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError, match="iteration"):
            tr._debug_check({"total": float("nan")})
    finally:
        jax.config.update("jax_debug_nans", False)


def test_blender_reader_and_training(tmp_path):
    """Write a tiny NeRF-synthetic layout and train a few steps."""
    from PIL import Image

    from vcr_gaus_tpu.train.trainer import Trainer
    from fixtures import make_cube_points, render_oracle_image, ring_cameras
    root = tmp_path / "blender"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir()
    pts, cols = make_cube_points(300)
    fovx = 0.9
    w, h = 64, 64
    for split, cams in (("train", ring_cameras(6)),
                        ("test", ring_cameras(2, dist=4.5))):
        frames = []
        for i, (R_w2c, T) in enumerate(cams):
            w2c = np.eye(4)
            w2c[:3, :3] = R_w2c
            w2c[:3, 3] = T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1          # back to OpenGL convention
            img = render_oracle_image(pts, cols, R_w2c, T, w, h, fovx, 0.9)
            rgba = np.concatenate([
                np.clip(img, 0, 1),
                np.ones((1, h, w), np.float32)], 0)
            Image.fromarray((rgba.transpose(1, 2, 0) * 255).astype(
                np.uint8), "RGBA").save(root / split / f"r_{i}.png")
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = str(root)
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.model.eval = True
    c.model.white_background = False
    c.tpu.capacity = 2048
    tr = Trainer(c)
    assert len(tr.scene.train_cameras) == 6
    assert len(tr.scene.test_cameras) == 2
    l0 = None
    for _ in range(10):
        losses, _ = tr.train_step()
        l0 = l0 or float(losses["l1"])
    assert np.isfinite(float(losses["total"]))


def test_gui_pump_serves_frames(tmp_path):
    """The viewer pump renders the requested camera at the viewer's
    resolution and streams the frame back (full receive/render loop; the
    reference wires only network_gui.init, trainer.py:64-65)."""
    import json
    import socket
    import threading
    import time

    import numpy as np

    from fixtures import write_colmap_scene
    from vcr_gaus_tpu.config import Config
    from vcr_gaus_tpu.render.network_gui import NetworkGUI
    from vcr_gaus_tpu.train.trainer import Trainer

    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=3, n_pts=120, width=48, height=32)
    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = root
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.tpu.capacity = 256
    tr = Trainer(c)
    tr._gui = NetworkGUI("127.0.0.1", 0)      # ephemeral port
    port = tr._gui.listener.getsockname()[1]

    W, H = 32, 16
    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        view = np.eye(4).reshape(-1).tolist()
        msg = json.dumps({
            "resolution_x": W, "resolution_y": H, "train": True,
            "fov_y": 0.6, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": view, "view_projection_matrix": view,
        }).encode()
        s.sendall(len(msg).to_bytes(4, "little"))
        s.sendall(msg)
        n = W * H * 3
        buf = b""
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            if not chunk:
                break
            buf += chunk
        vlen = int.from_bytes(s.recv(4), "little")
        results["verify"] = s.recv(vlen).decode()
        results["img_bytes"] = len(buf)
        s.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    for _ in range(400):                      # wait for the message to land
        tr._gui_pump()
        if results.get("img_bytes"):
            break
        time.sleep(0.05)
    t.join(timeout=10)
    assert results.get("img_bytes") == W * H * 3
    assert results.get("verify") == root

    # pause semantics: a `train: false` message must block training across
    # poll()==None gaps (the reference's blocking receive()), resuming only
    # on train=true or disconnect — not whenever the socket is idle.
    from vcr_gaus_tpu.render.network_gui import ViewerRequest

    class ScriptedGUI:
        def __init__(self, script):
            self.script = list(script)
            self.conn = object()      # pretend connected
            self.polls = 0

        def poll(self):
            self.polls += 1
            return self.script.pop(0) if self.script else None

        def send_image(self, img, verify):
            pass

    pause = ViewerRequest(camera=None, do_training=False, keep_alive=True)
    resume = ViewerRequest(camera=None, do_training=True, keep_alive=True)
    gui = ScriptedGUI([pause, None, None, None, resume])
    tr._gui = gui
    tr._gui_pump()                    # must consume through the resume
    assert not gui.script, "pump returned while still paused"
    assert tr._gui_paused is False

    # and a dropped connection while paused releases the pump
    gui2 = ScriptedGUI([pause, None])
    tr._gui = gui2
    orig_poll = gui2.poll

    def poll_then_drop():
        r = orig_poll()
        if r is None:
            gui2.conn = None          # simulate viewer disconnect
        return r
    gui2.poll = poll_then_drop
    tr._gui_pump()                    # returns instead of spinning forever


def test_tile_knob_flows_from_config(tmp_path):
    """tpu.tile=32 (the 1600-wide-protocol default, configs/dtu/base.yaml)
    must reach the kernel module before the first trace and train finitely;
    restores tile 16 for the rest of the suite."""
    from vcr_gaus_tpu.ops import rasterize_tpu as K
    from vcr_gaus_tpu.train.trainer import Trainer

    scene = str(tmp_path / "scene")
    write_colmap_scene(scene, n_cams=4, n_pts=200, width=64, height=48,
                       with_priors=True)
    cfg = Config("configs/config_base.yaml")
    cfg.logdir = str(tmp_path / "run")
    cfg.model.source_path = scene
    cfg.model.resolution = 1
    cfg.model.depth_type = "traditional"
    cfg.optim.densify_from_iter = 10_000      # no densify in 30 iters
    cfg.tpu.capacity = 1024
    cfg.tpu.tile = 32
    try:
        tr = Trainer(cfg)
        assert K.TILE == 32 and K.P == 1024
        hist = tr.train(max_iters=30, log_every=30)
        assert np.isfinite(hist[-1]["total"])
    finally:
        K.set_tile(16)
    assert K.TILE == 16
