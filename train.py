#!/usr/bin/env python
"""Training CLI (reference train.py:10-41): --config=<yaml> plus strict
dotted overrides, e.g.

  python train.py --config=configs/dtu/base.yaml \\
      --model.source_path=data/dtu/scan24 --logdir=output/dtu/scan24
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vcr_gaus_tpu.config import Config
from vcr_gaus_tpu.train.trainer import Trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--wandb", action="store_true",
                        help="log to wandb (needs the package installed)")
    args, overrides = parser.parse_known_args()
    if args.wandb:
        os.environ["VCR_WANDB"] = "1"

    from vcr_gaus_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config(args.config, overrides=overrides)
    if not cfg.logdir:
        raise SystemExit("set --logdir")
    os.makedirs(cfg.logdir, exist_ok=True)
    cfg.save(os.path.join(cfg.logdir, "config.yaml"))
    cfg.print_config()

    trainer = Trainer(cfg)
    print(f"scene: {len(trainer.scene.train_cameras)} train cams, "
          f"{len(trainer.scene.points)} init points, "
          f"capacity {trainer.state.capacity}")
    trainer.train()
    trainer.save()
    metrics = trainer.evaluate(
        max_cams=int(getattr(cfg.tpu, "eval_max_cams", 0) or 0))
    print("final:", metrics)
    trainer.finalize()


if __name__ == "__main__":
    main()
