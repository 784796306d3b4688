"""Offline eval CLI: `python -m gpv_tpu.cli.compute_predictions
eval.task=CocoVqa eval.subset=val <overrides...>`.

Behavior spec: reference `python -m exp.gpv.compute_predictions`
(`compute_predictions.py:127-191`): batched greedy inference over the chosen
task/subset -> HDF5 boxes + predictions JSON -> per-novelty evaluator metrics.
"""
import sys
from pathlib import Path


def main(argv=None):
    from gpv_tpu.datasets.coco import DATASET_CLASSES
    from gpv_tpu.infer.predictions import (evaluate_predictions,
                                           make_predictions)
    from gpv_tpu.utils.config import load_config
    from gpv_tpu.infer.build import build_engine

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv", overrides)
    task = cfg.eval.task
    subset = cfg.eval.subset

    ckpt = cfg.eval.get("ckpt")
    if not ckpt:
        cfg["ckpt"] = None  # explicit eval.ckpt=null: random-weight debug
    elif not Path(str(ckpt)).exists():
        # never silently evaluate random weights: a typo'd (or not-yet-
        # trained) checkpoint path must fail, not write garbage metrics
        raise SystemExit(
            f"eval.ckpt not found: {ckpt} "
            "(pass eval.ckpt=null explicitly to run with random weights)")
    else:
        cfg["ckpt"] = ckpt

    ld = cfg.learning_datasets
    task_cfg_name = ld[task].task_config if task in ld else None
    if task_cfg_name is None:
        # fall back: task name -> canonical config key
        task_cfg_name = {
            "CocoVqa": "coco_vqa", "CocoCaptioning": "coco_captioning",
            "CocoClassification": "coco_classification",
            "CocoDetection": "coco_detection", "RefCocop": "refcocop",
        }[task]
    task_cfg = cfg.task_configs[task_cfg_name]
    dataset = DATASET_CLASSES[task](task_cfg, subset, training=False)

    eval_dir = Path(cfg.exp_dir) / "eval"
    data_split = cfg.task_configs.data_split
    if cfg.eval.get("predict", True):
        # engine (ckpt load + BN fold + device commit) only on the predict
        # path — eval.predict=False re-scores existing predictions host-side
        engine = build_engine(cfg)
        beam_size = cfg.eval.get("beam_size")
        predictions, boxes_path, _ = make_predictions(
            engine, dataset, task, int(cfg.eval.batch_size), eval_dir,
            subset, data_split, cfg.eval.get("num_eval_batches"),
            beam_size=int(beam_size) if beam_size else None,
            num_workers=int(cfg.eval.get("num_workers", 8)),
            loader=str(cfg.eval.get("loader", "threads")))
    else:
        # re-evaluate previously written predictions (reference
        # compute_predictions honors eval.predict=False the same way)
        import json
        pred_path = (eval_dir
                     / f"{task}_{data_split}_{subset}_predictions.json")
        predictions = json.loads(pred_path.read_text())
        boxes_path = eval_dir / f"{task}_{subset}_boxes.h5py"

    metrics = evaluate_predictions(
        task, dataset.samples, predictions, boxes_path, eval_dir, subset,
        data_split,
        image_dir=task_cfg.image_dir if task in ("CocoDetection",
                                                 "RefCocop") else None)
    print(metrics.get("everything"))
    return metrics


if __name__ == "__main__":
    main()
