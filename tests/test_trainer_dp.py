"""Trainer with camera data-parallelism over the virtual 8-device mesh."""

import numpy as np
import pytest

from fixtures import write_colmap_scene
from vcr_gaus_tpu.config import Config


def test_trainer_camera_dp(tmp_path):
    from vcr_gaus_tpu.train.trainer import Trainer
    root = str(tmp_path / "scene")
    write_colmap_scene(root, n_cams=8, n_pts=300, width=64, height=48)
    c = Config("configs/config_base.yaml")
    c.logdir = str(tmp_path / "log")
    c.model.source_path = root
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.tpu.capacity = 1024
    c.tpu.camera_batch = 4        # 4 cameras per step over 4 devices
    tr = Trainer(c)
    assert tr.mesh is not None
    hist = []
    for _ in range(6):
        losses, aux = tr.train_step()
        hist.append(float(losses["l1"]))
    assert np.isfinite(hist).all()
    # state stays replicated and finite
    xyz = np.asarray(tr.state.params.xyz)
    assert np.isfinite(xyz).all()
    assert int(aux["n_active"]) == 300
    # densification stats accumulated across the batch
    assert float(np.asarray(tr.state.denom).max()) > 0
