"""Offline batched prediction + evaluation pipeline.

Behavior spec: reference `exp/gpv/compute_predictions.py` — batched greedy
decode (classification adds the COCO class-name vocab mask, use_syns=False),
boxes+relevance sorted by relevance to HDF5 groups keyed by sample id,
answers to `{task}_{split}_{subset}_predictions.json`, then per-novelty
evaluator runs into `..._metrics.json`; det/refexp samples get image W/H
attached first (`update_samples_with_image_size`).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..engine import GPVEngine
from ..evaluation.evaluators import (EVALUATOR_CLASSES, TASK_TO_ID_FIELD,
                                     coco_vocab_mask)  # noqa: F401 — moved
# to evaluation.evaluators (light import for bundle-serving hosts);
# re-exported here for the historical import path


def iter_padded_batches(dataset, batch_size: int, max_samples=None,
                        num_workers: int = 0, prefetch: int = 2):
    """Yield (items, n_real) with len(items) == batch_size for EVERY batch.

    The final partial batch is padded by repeating its last item — the same
    policy as `serve.py` — so one compiled executable serves the whole
    dataset regardless of divisibility (a trailing odd-size batch would
    otherwise trigger a second XLA compile per task).

    num_workers > 1 loads items on a thread pool with a `prefetch`-batch
    lookahead, overlapping host image decode/resize (PIL releases the GIL)
    with device compute — single-threaded PIL decode alone caps eval at a
    few hundred img/s, below the device rate (reference eval uses a
    num_workers dataloader, train_distr.py:213-222; this is the eval-side
    `eval.num_workers`). Each item draws from its own index-seeded
    RandomState, so results are identical for ANY worker count/order
    (eval-mode datasets don't consume the rng anyway — transforms are
    resize-only and VQA answer resampling is training-only).
    """
    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    starts = list(range(0, n, batch_size))

    def load_item(i):
        return dataset.get(i, np.random.RandomState(i))

    def pad(items):
        n_real = len(items)
        while len(items) < batch_size:
            items.append(items[-1])
        return items, n_real

    if num_workers and int(num_workers) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(int(num_workers)) as pool:
            depth = max(1, int(prefetch))
            pending = [
                [pool.submit(load_item, i)
                 for i in range(s, min(s + batch_size, n))]
                for s in starts[:depth]]
            for bi in range(len(starts)):
                futs = pending.pop(0)
                if bi + depth < len(starts):
                    s = starts[bi + depth]
                    pending.append(
                        [pool.submit(load_item, i)
                         for i in range(s, min(s + batch_size, n))])
                yield pad([f.result() for f in futs])
    else:
        for start in starts:
            yield pad([load_item(i)
                       for i in range(start, min(start + batch_size, n))])


def update_samples_with_image_size(image_dir, samples):
    from ..datasets.coco import coco_image_path
    from PIL import Image
    for sample in samples:
        path = coco_image_path(image_dir, sample["image"]["subset"],
                               sample["image"]["image_id"])
        with Image.open(path) as im:
            sample["image"]["W"], sample["image"]["H"] = im.size
    return samples


def make_predictions(engine: GPVEngine, dataset, task: str,
                     batch_size: int, eval_dir: str | Path, subset: str,
                     data_split: str = "gpv_split",
                     num_eval_batches: Optional[int] = None,
                     beam_size: Optional[int] = None,
                     num_workers: int = 0):
    """Run batched inference over a dataset; write HDF5 + JSON.

    `beam_size`: None/1 -> greedy (reference compute_predictions); K>1 ->
    batched beam search, keeping the top beam as the answer (BASELINE
    config #4: VQA/captioning with beam_size=5).
    `num_workers`: threaded image loading with batch lookahead
    (eval.num_workers; see iter_padded_batches).

    Returns (predictions dict, boxes path, predictions path).
    """
    import h5py

    eval_dir = Path(eval_dir)
    eval_dir.mkdir(parents=True, exist_ok=True)
    id_field = TASK_TO_ID_FIELD[task]

    vocab_mask = None
    if task == "CocoClassification":
        vocab_mask = coco_vocab_mask(engine.vocab, use_syns=False)

    boxes_path = eval_dir / f"{task}_{subset}_boxes.h5py"
    boxes_h5 = h5py.File(boxes_path, "w")
    predictions = {}
    cnt = 0
    for bi, (items, n_real) in enumerate(
            iter_padded_batches(dataset, batch_size,
                                num_workers=num_workers)):
        if num_eval_batches is not None and bi >= num_eval_batches:
            break
        images = np.stack([it["image"] for it in items])
        queries = [it["query"] for it in items]
        if beam_size and beam_size > 1:
            # reference_quirks: offline eval artifacts stay string-identical
            # to the reference's beam outputs (incl. its tail bug)
            bouts = engine.predict_beam(images, queries, beam_size,
                                        vocab_mask, reference_quirks=True)
            outs = [{"answer": b["answers"][0],
                     "answer_probs": b["answer_probs"],
                     "all_answers": b["answers"],
                     "boxes": b["boxes"], "relevance": b["relevance"]}
                    for b in bouts]
        else:
            outs = engine.predict(images, queries, vocab_mask)
        for it, out in zip(items[:n_real], outs[:n_real]):
            sample_id = it["sample"][id_field]
            predictions[sample_id] = {"answer": out["answer"]}
            if "all_answers" in out:
                predictions[sample_id]["answers"] = out["all_answers"]
                predictions[sample_id]["answer_probs"] = out["answer_probs"]
            grp = boxes_h5.create_group(str(sample_id))
            grp.create_dataset("boxes", data=out["boxes"])
            grp.create_dataset("relevance", data=out["relevance"])
            cnt += 1
    boxes_h5.close()

    pred_path = eval_dir / f"{task}_{data_split}_{subset}_predictions.json"
    pred_path.write_text(json.dumps(predictions, default=str))
    return predictions, boxes_path, pred_path


def evaluate_predictions(task: str, samples, predictions, boxes_path,
                         eval_dir, subset: str, data_split: str = "gpv_split",
                         image_dir: Optional[str] = None):
    """Run the task evaluator per novelty split -> metrics dict (+json)."""
    import h5py

    if task in ("CocoDetection", "RefCocop") and image_dir is not None:
        samples = update_samples_with_image_size(image_dir, samples)

    preds_by_str = {str(k): v for k, v in predictions.items()}
    boxes = h5py.File(boxes_path, "r") if boxes_path else None
    evaluator_cls = EVALUATOR_CLASSES[task]
    novelties = (["everything", "seen_concepts", "held_out_concepts"]
                 if data_split == "gpv_split" else ["everything"])
    metrics = {}
    for novelty in novelties:
        ev = evaluator_cls(samples, preds_by_str, boxes)
        metrics[novelty] = ev.evaluate(novelty)
    if boxes:
        boxes.close()

    out_path = (Path(eval_dir)
                / f"{task}_{data_split}_{subset}_metrics.json")
    out_path.write_text(json.dumps(metrics, default=str, indent=1))
    return metrics


def compute_vqa_test_predictions(engine, dataset, batch_size,
                                 out_path, num_workers: int = 0) -> list:
    """Eval-server format: [{'question_id', 'answer'}] (reference
    compute_vqa_test_predictions.py:29-67)."""
    results = []
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                             num_workers=num_workers):
        images = np.stack([it["image"] for it in items])
        outs = engine.predict(images, [it["query"] for it in items])
        for it, out in zip(items[:n_real], outs[:n_real]):
            results.append({"question_id": it["sample"]["question_id"],
                            "answer": out["answer"]})
    Path(out_path).write_text(json.dumps(results))
    return results


def compute_cap_test_predictions(engine, dataset, batch_size,
                                 out_path, num_workers: int = 0) -> list:
    """Eval-server format: [{'image_id', 'caption'}] (reference
    compute_cap_test_predictions.py:85-113)."""
    results = []
    for items, n_real in iter_padded_batches(dataset, batch_size,
                                             num_workers=num_workers):
        images = np.stack([it["image"] for it in items])
        outs = engine.predict(images, [it["query"] for it in items])
        for it, out in zip(items[:n_real], outs[:n_real]):
            results.append({"image_id": it["sample"]["image"]["image_id"],
                            "caption": out["answer"]})
    Path(out_path).write_text(json.dumps(results))
    return results
