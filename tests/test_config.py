import os
import textwrap

import pytest

from vcr_gaus_tpu.config import Config, parse_cmdline_overrides

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parent_chain_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        a: 1
        nested:
            x: 1
            y: 2
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent(f"""
        _parent_: {base}
        nested:
            y: 3
    """))
    cfg = Config(str(child))
    assert cfg.a == 1
    assert cfg.nested.x == 1
    assert cfg.nested.y == 3


def test_cli_override_strict(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("optim:\n  lr: 0.1\n  flag: false\n")
    cfg = Config(str(p), overrides=["--optim.lr=0.5", "--optim.flag"])
    assert cfg.optim.lr == 0.5
    assert cfg.optim.flag is True
    with pytest.raises(KeyError):
        Config(str(p), overrides=["--optim.nope=1"])


def test_bool_bang():
    d = parse_cmdline_overrides(["--a.b!", "--c"])
    assert d == {"a": {"b": False}, "c": True}


def test_shipped_recipes_load():
    cfg = Config(os.path.join(REPO, "configs", "dtu", "base.yaml"))
    assert cfg.optim.loss_weight.distortion == 1000
    assert cfg.optim.loss_weight.mono_normal == 0.01
    assert cfg.model.depth_type == "intersection"
    assert cfg.optim.prune.iterations == [15000, 25000]
    tnt = Config(os.path.join(REPO, "configs", "tnt", "base.yaml"))
    assert tnt.model.use_decoupled_appearance is True
    assert tnt.optim.loss_weight.semantic == 0.005
    assert tnt.optim.exp_t == 5e-3


def test_save_roundtrip(tmp_path):
    cfg = Config(os.path.join(REPO, "configs", "reconstruct.yaml"))
    out = tmp_path / "config.yaml"
    cfg.save(str(out))
    cfg2 = Config(str(out))
    assert cfg2.to_dict() == cfg.to_dict()
