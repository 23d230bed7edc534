"""Superstep dispatch (tpu.steps_per_call > 1): k iterations chained in one
XLA program via lax.scan (trainer.make_multi_train_step) must reproduce the
single-step trainer exactly — same camera sampling, same per-iteration LR /
background randomization, same densify/eval schedule — and fall back to
single steps around host-action iterations."""

import numpy as np
import pytest

from fixtures import write_colmap_scene
from vcr_gaus_tpu.config import Config


def _make_cfg(scene_dir, logdir, steps_per_call):
    c = Config("configs/config_base.yaml")
    c.logdir = logdir
    c.model.source_path = scene_dir
    c.model.resolution = 1
    c.model.depth_type = "traditional"
    c.optim.loss_weight.mono_normal = 0.01
    c.optim.densify_from_iter = 1000      # no densify inside the short run
    c.optim.opacity_reset_interval = 10_000
    c.tpu.capacity = 1024
    c.tpu.entry_budget_factor = 8
    c.tpu.steps_per_call = steps_per_call
    c.train.save_iterations = []
    c.train.checkpoint_iterations = []
    c.train.test_iterations = []
    return c


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("multi_scene"))
    write_colmap_scene(root, n_cams=5, n_pts=300, width=64, height=48,
                       with_priors=True)
    return root


@pytest.mark.xdist_group("trainer_multi")
def test_superstep_matches_single_steps(scene_dir, tmp_path_factory):
    """9 iterations as 3 supersteps of k=3 == 9 single steps: identical
    camera order (same host RNG pops), identical final state to float
    tolerance (scan vs eager only reorders fusion)."""
    from vcr_gaus_tpu.train.trainer import Trainer

    tr1 = Trainer(_make_cfg(scene_dir, str(tmp_path_factory.mktemp("l1")), 1))
    tr3 = Trainer(_make_cfg(scene_dir, str(tmp_path_factory.mktemp("l3")), 3))

    h1 = tr1.train(max_iters=9, log_every=3)
    h3 = tr3.train(max_iters=9, log_every=3)
    assert tr1.iteration == tr3.iteration == 9
    # superstep path actually engaged: the k=3 run used the stacked BinAux
    assert tr3._bin_aux_k is not None and tr3._bin_aux is None

    # scan vs eager reassociates float reductions; observed max drift after
    # 9 Adam steps is ~5e-5 absolute on O(1) coordinates
    x1 = np.asarray(tr1.state.params.xyz)
    x3 = np.asarray(tr3.state.params.xyz)
    np.testing.assert_allclose(x3, x1, rtol=1e-3, atol=1e-4)
    o1 = np.asarray(tr1.state.params.logit_opacity)
    o3 = np.asarray(tr3.state.params.logit_opacity)
    np.testing.assert_allclose(o3, o1, rtol=1e-3, atol=1e-4)
    # logged losses agree at the shared boundaries (iterations 3, 6, 9)
    l1 = {r["iter"]: r["total"] for r in h1}
    l3 = {r["iter"]: r["total"] for r in h3}
    for it in (3, 6, 9):
        assert abs(l1[it] - l3[it]) < 1e-3 * max(1.0, abs(l1[it]))


@pytest.mark.xdist_group("trainer_multi")
def test_superstep_defers_to_host_actions(scene_dir, tmp_path_factory):
    """A densify iteration inside the would-be window forces single steps
    (window check), and the superstep path resumes after it; sampled-ahead
    cameras of an abandoned staged batch are returned to the epoch pool."""
    from vcr_gaus_tpu.train.trainer import Trainer

    cfg = _make_cfg(scene_dir, str(tmp_path_factory.mktemp("ld")), 4)
    cfg.optim.densify_from_iter = 2
    cfg.optim.densification_interval = 6   # densify at iteration 6
    cfg.optim.densify_until_iter = 7
    tr = Trainer(cfg)

    # it=0: window [1,4] free -> superstep to 4
    tr.train_step()
    assert tr.iteration == 4 and tr._bin_aux_k is not None
    # it=4: window [5,8] straddles action at 6 -> single steps 5, 6
    tr.train_step()
    assert tr.iteration == 5 and tr._bin_aux_k is None
    pool_before = len(tr.viewpoint_stack)
    assert pool_before > 0          # staged batch was returned to the pool
    tr.train_step()                 # iteration 6 runs densify
    assert tr.iteration == 6
    # it=6: window [7,10] free again -> superstep
    tr.train_step()
    assert tr.iteration == 10 and tr._bin_aux_k is not None


@pytest.mark.xdist_group("trainer_multi")
def test_superstep_respects_max_iters(scene_dir, tmp_path_factory):
    """train(max_iters) never overshoots: a trailing remainder smaller than
    k runs as single steps."""
    from vcr_gaus_tpu.train.trainer import Trainer

    tr = Trainer(_make_cfg(scene_dir, str(tmp_path_factory.mktemp("lm")), 4))
    tr.train(max_iters=10, log_every=5)   # 4 + 4 + 2x1
    assert tr.iteration == 10
