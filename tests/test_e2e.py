"""End-to-end integration: synthetic COCO-format data on disk -> datasets ->
loader -> trainer steps -> in-train eval -> checkpoint -> offline
compute_predictions pipeline. Everything tiny, on the CPU mesh."""
import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from gpv_tpu.utils.config import load_config

IMG_H, IMG_W = 48, 64


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Fake COCO learning_phase_data tree with 6 samples per task."""
    root = tmp_path_factory.mktemp("gpv_data")
    img_dir = root / "learning_phase_data/coco/images/train2014"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n_imgs = 8
    for i in range(n_imgs):
        arr = rng.randint(0, 255, (96, 128, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{i:012d}.jpg")

    def image(i):
        return {"subset": "train2014", "image_id": i}

    def dump(task, samples):
        for subset in ("train", "val"):
            d = root / f"learning_phase_data/{task}/gpv_split"
            d.mkdir(parents=True, exist_ok=True)
            (d / f"{subset}.json").write_text(json.dumps(samples))

    cap = [{"query": "describe the image", "answer": "a man riding a horse",
            "cap_id": 100 + i, "image": image(i % n_imgs),
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    dump("coco_captions", cap)

    det = [{"query": "locate the dog", "boxes": [[10, 10, 40, 30],
                                                 [60, 40, 30, 20]],
            "id": 200 + i, "category_id": 18, "category_name": "dog",
            "image": image(i % n_imgs),
            "coco_categories": {"seen": ["dog"], "unseen": []}}
           for i in range(6)]
    dump("coco_detection", det)

    cls = [{"query": "what is this?", "boxes": [20, 20, 40, 40],
            "id": 300 + i, "category_id": 18, "answer": "dog",
            "image": image(i % n_imgs),
            "coco_categories": {"seen": ["dog"], "unseen": []}}
           for i in range(6)]
    dump("coco_classification", cls)

    vqa = [{"query": "how many dogs?", "answer": "two",
            "all_answers": {"two": 7, "three": 3},
            "question_id": 400 + i, "image": image(i % n_imgs),
            "anno": {"answer_type": "number", "question_type": "how many"},
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    dump("coco_vqa", vqa)

    ref = [{"query": "the dog on the left", "boxes": [[10, 10, 40, 30]],
            "sent_id": 500 + i, "image": image(i % n_imgs),
            "coco_categories": {"seen": [], "unseen": []}}
           for i in range(6)]
    d = root / "learning_phase_data/refcocop"
    d.mkdir(parents=True, exist_ok=True)
    for name in ("train", "train_100", "val"):
        (d / f"{name}.json").write_text(json.dumps(ref))
    return root


TINY_OVERRIDES = [
    "model.hidden_dim=32",
    "model.detr.hidden_dim=32",
    "model.detr.nheads=4",
    "model.detr.num_queries=10",
    "model.detr.num_encoder_layers=1",
    "model.detr.num_decoder_layers=1",
    "model.detr.dim_feedforward=64",
    "model.detr.backbone_layers=[1,1,1,1]",
    "model.detr_joiner.detr_dim=2080",
    "model.co_att.num_layers=1",
    "model.co_att.bi_num_attention_heads=4",
    "model.co_att.intermediate_size=64",
    "model.text_decoder.num_layers=1",
    "model.max_text_len=8",
    "model.max_target_boxes=8",
    "model.bert={num_layers: 1, hidden: 32, heads: 4, vocab_size: 100}",
    "training.batch_size=8",
    "training.num_epochs=1",
    "training.num_workers=2",
    "training.log_step=1",
    "training.vis_step=100000",
    "training.num_vis_samples=2",
    "eval.batch_size=4",
    "tpu.dtype=float32",
]


def tiny_cfg(data_dir, exp_dir, extra=()):
    nvs = ["training.num_val_samples={coco_vqa: 4, coco_cap: 4, "
           "coco_det: 4, coco_cls: 4, refcocop: 4}"]
    return load_config("configs", "exp/gpv", [
        f"data_dir={data_dir}", f"output_dir={exp_dir}",
        "exp_name=e2e", "learning_datasets=all",
        "task_configs.image_size={H: %d, W: %d}" % (IMG_H, IMG_W),
    ] + TINY_OVERRIDES + nvs + list(extra))


class TestDatasets:
    def test_multitask_dataset_and_loader(self, data_dir, tmp_path):
        cfg = tiny_cfg(data_dir, tmp_path)
        from gpv_tpu.datasets import (CocoMultitaskDataset, Collator,
                                      DataLoader)
        from gpv_tpu.text.vocab import AnswerVocab
        from gpv_tpu.text.wordpiece import WordPieceTokenizer
        ds = CocoMultitaskDataset(cfg.learning_datasets, cfg.task_configs,
                                  "train", training=True)
        assert len(ds) == 24
        col = Collator(AnswerVocab.debug(), WordPieceTokenizer.debug(),
                       max_text_len=8, max_target_boxes=8)
        loader = DataLoader(ds, col, batch_size=8, num_workers=2, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["image"].shape == (8, IMG_H, IMG_W, 3)
        assert b["query_ids"].shape[0] == 8
        assert b["boxes"].shape == (8, 8, 4)
        # detection boxes are normalized cxcywh in [0,1]
        valid_boxes = b["boxes"][b["box_valid"]]
        if len(valid_boxes):
            assert (valid_boxes >= 0).all() and (valid_boxes <= 1).all()

    def test_vqa_answer_resampling_deterministic_rng(self, data_dir,
                                                     tmp_path):
        cfg = tiny_cfg(data_dir, tmp_path)
        from gpv_tpu.datasets.coco import CocoVqa
        ds = CocoVqa(cfg.task_configs.coco_vqa, "train", training=True)
        seen = set()
        for trial in range(20):
            item = ds.get(0, np.random.RandomState(trial))
            seen.add(item["answer"])
        assert seen.issubset({"two", "three"})
        assert "two" in seen  # freq 7 dominates


@pytest.mark.slow
class TestTrainerE2E:
    def test_train_eval_checkpoint_cycle(self, data_dir, tmp_path):
        # grad_accum_steps exercises the trainer's microbatch wiring
        # (batch 8 -> 2 x 4 scanned microbatches) through the full cycle
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("training.grad_accum_steps=2",))
        from gpv_tpu.train.trainer import Trainer
        trainer = Trainer(cfg)
        results = trainer.train()
        assert "model_selection_metric" in results
        assert np.isfinite(results["model_selection_metric"])
        # checkpoint written
        ckpt_dir = Path(cfg.ckpt_dir)
        assert (ckpt_dir / "model").exists()
        assert (ckpt_dir / "model.meta.json").exists()
        # visualizations written
        vis = list(Path(cfg.exp_dir).glob("training_visualizations/*/index.html"))
        assert vis

    def test_resume_from_checkpoint(self, data_dir, tmp_path):
        """Resume restores params/opt-state/step and continues training."""
        cfg = tiny_cfg(data_dir, tmp_path)
        from gpv_tpu.train.trainer import Trainer
        t1 = Trainer(cfg)
        t1.train()
        # deterministic final save of the CURRENT state (the best-metric
        # checkpoint may date from the launch eval, reference semantics)
        t1.save(0, {"model_selection_metric": 999.0})

        cfg2 = tiny_cfg(data_dir, tmp_path,
                        extra=[f"training.ckpt={cfg.ckpt_dir}/model",
                               "training.num_epochs=2"])
        t2 = Trainer(cfg2)
        np.testing.assert_array_equal(
            np.asarray(t2.state.params["detr_joiner"]["kernel"]),
            np.asarray(t1.state.params["detr_joiner"]["kernel"]))
        assert t2.best_metric == pytest.approx(999.0)
        assert int(t2.state.step) == t1.step
        t2.train()  # continues from epoch last_epoch+1 without error

    def test_finetune_mode_refcocop(self, data_dir, tmp_path):
        """finetune_distr semantics: refcocop data, selection = refexp mAP,
        eval_every gating."""
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=["learning_datasets=refcocop",
                              "training.eval_every=5",
                              "exp_name=ft"])
        from gpv_tpu.train.trainer import Trainer
        trainer = Trainer(cfg, finetune=True)
        results = trainer.train()
        assert "refexp_map" in results
        assert results["model_selection_metric"] == results["refexp_map"]

    def test_compute_predictions_pipeline(self, data_dir, tmp_path):
        cfg = tiny_cfg(data_dir, tmp_path)
        from gpv_tpu.datasets.coco import CocoVqa
        from gpv_tpu.engine import GPVEngine
        from gpv_tpu.infer.predictions import (evaluate_predictions,
                                               make_predictions)
        from gpv_tpu.text.vocab import AnswerVocab
        from gpv_tpu.text.wordpiece import WordPieceTokenizer
        import jax.numpy as jnp
        engine = GPVEngine.from_config(cfg.model, AnswerVocab.debug(),
                                       WordPieceTokenizer.debug(),
                                       dtype=jnp.float32)
        ds = CocoVqa(cfg.task_configs.coco_vqa, "val", training=False)
        eval_dir = tmp_path / "eval"
        preds, boxes_path, pred_path = make_predictions(
            engine, ds, "CocoVqa", 4, eval_dir, "val")
        assert len(preds) == 6
        assert boxes_path.exists() and pred_path.exists()
        metrics = evaluate_predictions("CocoVqa", ds.samples, preds,
                                       boxes_path, eval_dir, "val")
        assert "everything" in metrics
        assert "accuracy" in metrics["everything"]

        # Static-shape guarantee: the 6-sample/batch-4 eval above is
        # non-divisible; the trailing batch pads by repetition so ONE
        # compiled greedy executable serves the whole dataset (a second
        # entry would mean a per-dataset-size recompile).
        assert engine._greedy._cache_size() == 1

        # num_eval_batches caps the batch count EXACTLY (the reference's
        # num_val_samples accounting; was off by one)
        preds_cap, _, _ = make_predictions(
            engine, ds, "CocoVqa", 4, tmp_path / "eval_cap1", "val",
            num_eval_batches=1)
        assert len(preds_cap) == 4
        assert engine._greedy._cache_size() == 1

        # beam-search eval path (BASELINE config #4): top beam scored,
        # all K answers + probs recorded
        preds_b, _, _ = make_predictions(
            engine, ds, "CocoVqa", 4, tmp_path / "eval_beam", "val",
            beam_size=3)
        any_pred = next(iter(preds_b.values()))
        assert len(any_pred["answers"]) == 3
        assert any_pred["answer"] == any_pred["answers"][0]
        probs = any_pred["answer_probs"]
        assert all(probs[i] >= probs[i + 1] - 1e-6
                   for i in range(len(probs) - 1))
