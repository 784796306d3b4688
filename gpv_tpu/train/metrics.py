"""Train-time (subsampled) evaluation metrics.

Behavior spec: reference `exp/gpv/metrics.py` — per-task greedy-decode loops
capped at `training.num_val_samples[task]`: VQA soft accuracy (:15),
captioning Bleu/Cider via the caption evaluator (:68), classification
accuracy with the synonym vocab mask (use_syns=True, :147), detection/refexp
per-sample AP via temp box storage (:217, :294). Here all tasks share the
jitted `GPVEngine.predict` path; det/refexp APs are computed in-memory (no
temp HDF5 round-trip).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..engine import GPVEngine
from ..evaluation.evaluators import (CocoCaptioning as CapEvaluator,
                                     coco_synonyms)
from ..evaluation.voc_ap import voc_ap
from ..infer.predictions import coco_vocab_mask, iter_padded_batches


def vqa_accuracy(engine: GPVEngine, dataset, batch_size: int,
                 max_samples: int, num_workers: int = 0) -> float:
    correct = total = 0
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                              max_samples,
                                              num_workers=num_workers):
        outs = engine.predict(np.stack([it["image"] for it in items]),
                              [it["query"] for it in items])
        for it, out in zip(items[:n_real], outs[:n_real]):
            answers = it["sample"].get("all_answers", {})
            if out["answer"] in answers:
                correct += min(answers[out["answer"]] / 3, 1)
            total += 1
    return round(correct / (total + 1e-6), 4)


def cls_metrics(engine: GPVEngine, dataset, batch_size: int,
                max_samples: int, num_workers: int = 0) -> Dict:
    syn = coco_synonyms()
    mask = coco_vocab_mask(engine.vocab, use_syns=True)
    correct = total = 0
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                              max_samples,
                                              num_workers=num_workers):
        outs = engine.predict(np.stack([it["image"] for it in items]),
                              [it["query"] for it in items], mask)
        for it, out in zip(items[:n_real], outs[:n_real]):
            gt = it["sample"]["answer"]
            if out["answer"] in syn.get(gt, [gt]):
                correct += 1
            total += 1
    acc = round(correct / (total + 1e-6), 4)
    return {"accuracy": acc}


def cap_metrics(engine: GPVEngine, dataset, batch_size: int,
                max_samples: int, num_workers: int = 0) -> Dict:
    predictions = {}
    used_samples = []
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                              max_samples,
                                              num_workers=num_workers):
        outs = engine.predict(np.stack([it["image"] for it in items]),
                              [it["query"] for it in items])
        for it, out in zip(items[:n_real], outs[:n_real]):
            sample = it["sample"]
            used_samples.append(sample)
            predictions[str(sample["cap_id"])] = {"answer": out["answer"]}
    if not predictions:
        return {"Bleu4": 0, "Cider": 0}
    ev = CapEvaluator(used_samples, predictions)
    return ev.evaluate()["scores"]


def _box_map(engine: GPVEngine, dataset, batch_size: int,
             max_samples: int, num_workers: int = 0) -> float:
    """Shared det/refexp subsampled mAP (reference det_metrics/
    refexp_metrics write temp HDF5; we keep boxes in memory)."""
    aps = []
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                              max_samples,
                                              num_workers=num_workers):
        outs = engine.predict(np.stack([it["image"] for it in items]),
                              [it["query"] for it in items])
        for it, out in zip(items[:n_real], outs[:n_real]):
            if "boxes" not in it:
                continue
            # predictions normalized cxcywh -> xywh
            pred = np.asarray(out["boxes"], np.float64).copy()
            pred[:, 0] -= 0.5 * pred[:, 2]
            pred[:, 1] -= 0.5 * pred[:, 3]
            # GT normalized cxcywh (dataset layer) -> xywh
            gt = np.asarray(it["boxes"], np.float64).copy()
            gt[:, 0] -= 0.5 * gt[:, 2]
            gt[:, 1] -= 0.5 * gt[:, 3]
            aps.append(voc_ap(pred, np.asarray(out["relevance"]), gt))
    return float(np.mean(aps)) if aps else 0.0


def det_metrics(engine, dataset, batch_size, max_samples,
                num_workers: int = 0) -> Dict:
    return {"mAP": _box_map(engine, dataset, batch_size, max_samples,
                            num_workers)}


def refexp_metrics(engine, dataset, batch_size, max_samples,
                   num_workers: int = 0) -> Dict:
    return {"mAP": _box_map(engine, dataset, batch_size, max_samples,
                            num_workers)}
