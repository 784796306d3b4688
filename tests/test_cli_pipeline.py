"""Offline data-pipeline CLI integration: raw COCO/VQA annotation JSONs ->
preprocess CLI -> SCE split CLI -> stats CLI, all on a synthetic tree."""
import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw") / "data"
    lp = root / "learning_phase_data"
    (lp / "coco/annotations").mkdir(parents=True)
    (lp / "vqa/questions").mkdir(parents=True)
    (lp / "vqa/anno").mkdir(parents=True)

    def img(i):
        return {"id": i, "file_name": f"COCO_train2014_{i:012d}.jpg"}

    instances = {
        "images": [img(i) for i in range(6)],
        "categories": [{"id": 1, "name": "person"},
                       {"id": 18, "name": "dog"},
                       {"id": 3, "name": "car"}],
        "annotations": [
            {"image_id": i, "category_id": c, "id": 100 * i + c,
             "bbox": [5, 5, 30, 40]}
            for i in range(6) for c in (1, 18)],
    }
    (lp / "coco/annotations/instances_train2014.json").write_text(
        json.dumps(instances))
    captions = {
        "images": [img(i) for i in range(6)],
        "annotations": [
            {"image_id": i, "id": 900 + i,
             "caption": ("a dog in a field" if i % 2 else
                         "a person walking")}
            for i in range(6)],
    }
    (lp / "coco/annotations/captions_train2014.json").write_text(
        json.dumps(captions))
    questions = {
        "data_subtype": "train2014",
        "questions": [{"image_id": i, "question": "what animal is this?",
                       "question_id": 70 + i} for i in range(6)],
    }
    (lp / "vqa/questions/v2_OpenEnded_mscoco_train2014_questions.json"
     ).write_text(json.dumps(questions))
    annos = {"annotations": [
        {"question_id": 70 + i, "image_id": i,
         "multiple_choice_answer": "dog", "question_type": "what animal",
         "answer_type": "other",
         "answers": [{"answer": "dog"}] * 9 + [{"answer": "puppy"}]}
        for i in range(6)]}
    (lp / "vqa/anno/v2_mscoco_train2014_annotations.json").write_text(
        json.dumps(annos))
    return root


class TestOfflinePipelineClis:
    def test_preprocess_then_sce_split_then_stats(self, raw_tree, capsys):
        from gpv_tpu.cli.preprocess import main as preprocess_main
        preprocess_main([f"data_dir={raw_tree}", "subsets=train"])
        lp = raw_tree / "learning_phase_data"
        det = json.loads(
            (lp / "coco_detection/original_split/train.json").read_text())
        assert len(det) == 12  # 6 images x 2 categories
        vqa = json.loads(
            (lp / "coco_vqa/original_split/train.json").read_text())
        assert vqa[0]["all_answers"] == {"dog": 9, "puppy": 1}
        vocab = json.loads((lp / "vocab/vocab.json").read_text())
        assert "__stop__" in vocab

        from gpv_tpu.cli.make_sce_split import main as sce_main
        sce_main([f"data_dir={raw_tree}", "seed=0", "train_frac=0.5"])
        split = json.loads(
            (lp / "coco_sce/category_split.json").read_text())
        assert split["shared"][0]["name"] == "person"
        # gpv_split emitted for at least detection + vqa
        assert (lp / "coco_detection/gpv_split/train.json").exists()
        kept = json.loads(
            (lp / "coco_vqa/gpv_split/train.json").read_text())
        for s in kept:
            assert "coco_categories" in s
            assert not s["coco_categories"]["unseen"]
        # gpv val = COCO train.json samples on the train2014 HOLDOUT ids
        # (reference split_data_by_categories.yaml dataset mapping:
        # val: train.json). Regression: reading val.json produced an
        # always-empty val split.
        val = json.loads(
            (lp / "coco_vqa/gpv_split/val.json").read_text())
        train = json.loads(
            (lp / "coco_vqa/gpv_split/train.json").read_text())
        assert val, "gpv_split val must be non-empty (train2014 holdout)"
        train_ids = {s["image"]["image_id"] for s in train}
        val_ids = {s["image"]["image_id"] for s in val}
        assert not (train_ids & val_ids), "train/val image leak"

        from gpv_tpu.cli.data_stats import main as stats_main
        stats_main([f"data_dir={raw_tree}", "split=gpv_split"])
        out = capsys.readouterr().out
        assert "num_samples" in out


class TestDownloadCLI:
    def test_config_driven_urls_and_flags(self, monkeypatch, tmp_path):
        """cli.download composes the configs/data/download.yaml URL tree
        (reference configs/data/download.yaml schema) with hydra-style
        overrides; network calls are stubbed."""
        from gpv_tpu.cli.download import main as download_main
        from gpv_tpu.data import download as dl

        got = []
        monkeypatch.setattr(dl, "download_url",
                            lambda url, dest: got.append(url) or
                            (tmp_path / "x.zip"))
        monkeypatch.setattr(dl, "unzip", lambda a, d: None)

        download_main([f"data_dir={tmp_path}",
                       "download_coco_images_only=True"])
        assert got == [
            "http://images.cocodataset.org/zips/train2014.zip",
            "http://images.cocodataset.org/zips/val2014.zip"]

        got.clear()
        download_main([
            f"data_dir={tmp_path}", "download_coco_images_only=True",
            "urls.coco.images.train2014=http://mirror/train2014.zip"])
        assert got[0] == "http://mirror/train2014.zip"

        got.clear()
        download_main([f"data_dir={tmp_path}", "images_only=true"])  # legacy
        assert len(got) == 2

    def test_full_tree_includes_vqa_and_refexp(self, monkeypatch, tmp_path):
        from gpv_tpu.cli.download import main as download_main
        from gpv_tpu.data import download as dl

        got = []
        monkeypatch.setattr(dl, "download_url",
                            lambda url, dest: got.append(url) or
                            (tmp_path / "x.zip"))
        monkeypatch.setattr(dl, "unzip", lambda a, d: None)
        download_main([f"data_dir={tmp_path}"])
        assert any("v2_Questions_Train" in u for u in got)
        assert any("refcoco+.zip" in u for u in got)
        assert any("annotations_trainval2014" in u for u in got)
