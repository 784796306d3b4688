"""RefCOCO+ finetuning CLI: `python -m gpv_tpu.cli.finetune <overrides...>`.

Behavior spec: reference `python -m exp.gpv.finetune_distr`
(`finetune_distr.py:443-460`): same trainer shape with refcocop data,
selection metric = refexp mAP, eval gated by `training.eval_every`, and
checkpoint loading that does NOT restore step/epoch.
"""
import sys


def main(argv=None):
    from gpv_tpu.train.trainer import Trainer
    from gpv_tpu.utils.config import load_config

    overrides = ["learning_datasets=refcocop"] + list(
        argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv", overrides)
    from pathlib import Path
    Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
    trainer = Trainer(cfg, finetune=True)
    return trainer.train()


if __name__ == "__main__":
    main()
