"""Evaluator tests with tiny synthetic samples and hand-computed values
(SURVEY.md §4 test plan item d)."""
import numpy as np
import pytest

from gpv_tpu.evaluation import (CocoCaptioning, CocoClassification,
                                CocoDetection, CocoVqa, bleu_corpus, cider_d,
                                ptb_tokenize_caption, voc_ap)


class TestVqaEvaluator:
    def test_soft_accuracy(self):
        samples = [
            {"question_id": 1, "all_answers": {"yes": 10},
             "anno": {"answer_type": "yes/no", "question_type": "is"},
             "coco_categories": {"seen": [], "unseen": []}},
            {"question_id": 2, "all_answers": {"2": 2, "3": 8},
             "anno": {"answer_type": "number", "question_type": "how many"},
             "coco_categories": {"seen": [], "unseen": []}},
            {"question_id": 3, "all_answers": {"red": 10},
             "anno": {"answer_type": "other", "question_type": "what color"},
             "coco_categories": {"seen": [], "unseen": []}},
        ]
        preds = {"1": {"answer": "yes"},   # credit 1.0
                 "2": {"answer": "2"},     # credit 2/3
                 "3": {"answer": "blue"}}  # credit 0
        m = CocoVqa(samples, preds)
        acc = m.evaluate()["accuracy"]["all"]
        expect = round(100 * (1 + 2 / 3 + 0) / 3, 2)
        assert abs(acc - expect) < 0.02

    def test_novelty_filter(self):
        samples = [
            {"question_id": 1, "all_answers": {"yes": 10},
             "anno": {"answer_type": "t", "question_type": "q"},
             "coco_categories": {"seen": [], "unseen": ["dog"]}},
            {"question_id": 2, "all_answers": {"no": 10},
             "anno": {"answer_type": "t", "question_type": "q"},
             "coco_categories": {"seen": ["cat"], "unseen": []}},
        ]
        preds = {"1": {"answer": "yes"}, "2": {"answer": "yes"}}
        m = CocoVqa(samples, preds)
        held = m.evaluate("held_out_concepts")
        assert held["total"]["all"] == 1
        assert held["accuracy"]["all"] == 100.0
        seen = m.evaluate("seen_concepts")
        assert seen["accuracy"]["all"] == 0.0


class TestClsEvaluator:
    def test_synonym_credit(self):
        samples = [
            {"id": 1, "answer": "person", "coco_categories": {"unseen": []}},
            {"id": 2, "answer": "car", "coco_categories": {"unseen": []}},
        ]
        preds = {"1": {"answer": "man"},   # synonym of person
                 "2": {"answer": "banana"}}
        m = CocoClassification(samples, preds)
        out = m.evaluate()
        assert out["overall_correct"] == 1
        assert out["overall_total"] == 2


class TestCaptionMetrics:
    def test_ptb_tokenize(self):
        assert ptb_tokenize_caption("A man, riding a horse.") == \
            "a man riding a horse"

    def test_bleu_perfect_match(self):
        refs = {"a": ["the cat sat on the mat"]}
        hyps = {"a": ["the cat sat on the mat"]}
        bleus = bleu_corpus(refs, hyps)
        for b in bleus:
            assert abs(b - 1.0) < 1e-6

    def test_bleu_partial(self):
        refs = {"a": ["the cat sat on the mat"]}
        hyps = {"a": ["the cat sat"]}
        b = bleu_corpus(refs, hyps)
        # unigram precision 1.0, brevity penalty exp(1 - 6/3)
        assert abs(b[0] - np.exp(1 - 2.0)) < 1e-6

    def test_cider_identity_highest(self):
        refs = {"a": ["a man riding a horse", "a person on a horse"],
                "b": ["two dogs play in snow", "dogs playing in the snow"]}
        hyps_good = {"a": ["a man riding a horse"],
                     "b": ["dogs playing in the snow"]}
        hyps_bad = {"a": ["completely unrelated words here"],
                    "b": ["nothing matches at all either"]}
        good = cider_d(refs, hyps_good)
        bad = cider_d(refs, hyps_bad)
        assert good > bad
        assert bad < 0.5

    def test_caption_evaluator_end_to_end(self):
        caps = ["A man riding a horse.", "Two dogs play in deep snow.",
                "A red bus parked on the street.",
                "People eating pizza at a table."]
        samples = [
            {"cap_id": i, "answer": c,
             "image": {"subset": "train2014", "image_id": i},
             "coco_categories": {"unseen": []}}
            for i, c in enumerate(caps)]
        preds = {str(i): {"answer": c.lower().rstrip(".")}
                 for i, c in enumerate(caps)}
        m = CocoCaptioning(samples, preds)
        out = m.evaluate()
        assert out["scores"]["Bleu1"] > 0.95
        assert out["scores"]["Cider"] > 1.0  # idf-weighted exact matches


class TestDetectionAP:
    def test_perfect_predictions(self):
        gt = np.asarray([[0.1, 0.1, 0.2, 0.2], [0.5, 0.5, 0.3, 0.3]])
        pred = np.concatenate([gt, np.asarray([[0.0, 0.0, 0.05, 0.05]])])
        scores = np.asarray([0.9, 0.8, 0.1])
        assert abs(voc_ap(pred, scores, gt) - 1.0) < 1e-6

    def test_all_misses(self):
        gt = np.asarray([[0.1, 0.1, 0.2, 0.2]])
        pred = np.asarray([[0.7, 0.7, 0.1, 0.1]])
        assert voc_ap(pred, np.asarray([0.9]), gt) == 0.0

    def test_half_precision_case(self):
        """1 GT, 2 dets: first (higher score) misses, second hits ->
        every-point AP = precision at the hit = 1/2."""
        gt = np.asarray([[0.1, 0.1, 0.2, 0.2]])
        pred = np.asarray([[0.7, 0.7, 0.1, 0.1], [0.1, 0.1, 0.2, 0.2]])
        scores = np.asarray([0.9, 0.5])
        assert abs(voc_ap(pred, scores, gt) - 0.5) < 1e-6

    def test_detection_evaluator(self):
        samples = [{
            "id": 1, "category_name": "dog",
            "boxes": [[10, 10, 50, 50]],
            "image": {"W": 100, "H": 100, "subset": "val2014",
                      "image_id": 3},
            "coco_categories": {"unseen": []},
        }]
        preds = {"1": {"answer": ""}}
        boxes = {"1": {
            "boxes": {(): None},  # placeholder; dict-style access below
        }}

        class Entry(dict):
            def __getitem__(self, k):
                v = dict.__getitem__(self, k)
                return v

        # cxcywh normalized: gt box = x10 y10 w50 h50 -> cx .35 cy .35 w.5 h.5
        arr_boxes = np.asarray([[0.35, 0.35, 0.5, 0.5],
                                [0.8, 0.8, 0.1, 0.1]], np.float32)
        rel = np.asarray([0.9, 0.1], np.float32)

        class H5Like:
            def __init__(self, a):
                self.a = a

            def __getitem__(self, k):
                return self.a

        boxes = {"1": {"boxes": H5Like(arr_boxes), "relevance": H5Like(rel)}}
        m = CocoDetection(samples, preds, boxes)
        out = m.evaluate()
        assert abs(out["mAP"] - 1.0) < 1e-6


class TestPaddedBatchIterator:
    """iter_padded_batches: padding policy + threaded-loader determinism."""

    class _FakeDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def get(self, i, rng):
            return {"idx": i, "draw": float(rng.rand())}

    def test_threaded_equals_sequential(self):
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = self._FakeDataset(13)
        seq = [([it["idx"] for it in items], n)
               for items, n in iter_padded_batches(ds, 4)]
        thr = [([it["idx"] for it in items], n)
               for items, n in iter_padded_batches(ds, 4, num_workers=4)]
        assert seq == thr
        # per-item index-seeded rng: identical draws under any worker count
        seq_d = [it["draw"] for items, _ in iter_padded_batches(ds, 4)
                 for it in items]
        thr_d = [it["draw"]
                 for items, _ in iter_padded_batches(ds, 4, num_workers=4)
                 for it in items]
        assert seq_d == thr_d

    def test_final_batch_pads_by_repetition(self):
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = self._FakeDataset(5)
        batches = list(iter_padded_batches(ds, 4, num_workers=2))
        assert len(batches) == 2
        items, n_real = batches[1]
        assert n_real == 1
        assert [it["idx"] for it in items] == [4, 4, 4, 4]

    def test_max_samples_cap(self):
        from gpv_tpu.infer.predictions import iter_padded_batches
        ds = self._FakeDataset(50)
        batches = list(iter_padded_batches(ds, 4, max_samples=6,
                                           num_workers=3))
        assert sum(n for _, n in batches) == 6
