"""Training CLI: `python -m gpv_tpu.cli.train <overrides...>`.

Behavior spec: reference `python -m exp.gpv.train_distr` hydra entry
(`train_distr.py:478-495`) — composes configs/exp/gpv.yaml with dotted CLI
overrides and runs the multitask trainer. The mp.spawn/DDP launch is replaced
by the single-process mesh runtime.
"""
import sys


def main(argv=None):
    from gpv_tpu.train.trainer import Trainer
    from gpv_tpu.utils.config import load_config, save_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv", overrides)
    from pathlib import Path
    Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, Path(cfg.exp_dir) / "config.yaml")
    trainer = Trainer(cfg)
    return trainer.train()


if __name__ == "__main__":
    main()
