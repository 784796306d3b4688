"""Eval-server prediction CLIs (VQA test/testdev, COCO captioning test).

Behavior spec: reference `exp/gpv/compute_vqa_test_predictions.py` /
`compute_cap_test_predictions.py` + their eval_{vqa,cap}_test.sh drivers.

`python -m gpv_tpu.cli.compute_test_predictions kind=vqa eval.subset=test ...`
"""
import sys
from pathlib import Path


def main(argv=None):
    from gpv_tpu.datasets.coco import (CocoCapTestOriginalSplit,
                                       CocoVqaTestOriginalSplit)
    from gpv_tpu.infer.predictions import (compute_cap_test_predictions,
                                           compute_vqa_test_predictions)
    from gpv_tpu.utils.config import load_config
    from gpv_tpu.infer.build import build_engine

    overrides = [o for o in (argv or sys.argv[1:]) if not
                 o.startswith("kind=")]
    kind = next((o.split("=", 1)[1] for o in (argv or sys.argv[1:])
                 if o.startswith("kind=")), "vqa")
    cfg = load_config("configs", "exp/gpv",
                      ["task_configs.data_split=original_split"] + overrides)
    subset = cfg.eval.subset
    ckpt = cfg.eval.get("ckpt")
    if not ckpt:
        cfg["ckpt"] = None  # explicit eval.ckpt=null: random-weight debug
    elif not Path(str(ckpt)).exists():
        # never silently submit random-weight predictions to an eval server
        raise SystemExit(
            f"eval.ckpt not found: {ckpt} "
            "(pass eval.ckpt=null explicitly to run with random weights)")
    else:
        cfg["ckpt"] = ckpt
    engine = build_engine(cfg)
    out_dir = Path(cfg.exp_dir) / "eval"
    out_dir.mkdir(parents=True, exist_ok=True)

    if kind == "vqa":
        ds = CocoVqaTestOriginalSplit(cfg.task_configs.coco_vqa, subset)
        out = out_dir / f"vqa_{subset}_predictions.json"
        compute_vqa_test_predictions(engine, ds, int(cfg.eval.batch_size),
                                     out,
                                     num_workers=int(
                                         cfg.eval.get("num_workers", 8)),
                                     loader=str(
                                         cfg.eval.get("loader", "threads")))
    else:
        ds = CocoCapTestOriginalSplit(cfg.task_configs.coco_captioning,
                                      subset)
        out = out_dir / f"cap_{subset}_predictions.json"
        compute_cap_test_predictions(engine, ds, int(cfg.eval.batch_size),
                                     out,
                                     num_workers=int(
                                         cfg.eval.get("num_workers", 8)),
                                     loader=str(
                                         cfg.eval.get("loader", "threads")))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
