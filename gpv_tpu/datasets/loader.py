"""Batch assembly + threaded prefetching loader (host side).

Behavior spec: reference `detr_misc.collate_fn` (pad-to-max NestedTensor,
:267-299) + the DataLoader(num_workers=30) host pipeline in
`exp/gpv/train_distr.py:213-222`. TPU redesign: images are already fixed-size
(480x640) so no ragged padding is needed; the collator emits the fully static
batch dict the jitted train step consumes (tokenized queries, encoded answers,
padded GT boxes with validity masks, per-sample task ids) and a worker pool
overlaps decode/augment with device execution. Batches are dropped to a fixed
size (`drop_last`) so one XLA executable serves the whole epoch.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List

import numpy as np

from ..losses.criterion import TASK_IDS
from ..text.vocab import AnswerVocab
from ..text.wordpiece import WordPieceTokenizer


class Collator:
    # default unique-query bucket; the trainer validates this against the
    # mesh data-axis size when query_dedup is on (every emitted U is a
    # bucket multiple capped at B, and the batch pytree is data-sharded)
    DEDUP_BUCKET = 16

    def __init__(self, vocab: AnswerVocab, tokenizer: WordPieceTokenizer,
                 max_text_len: int = 20, max_query_len: int = 20,
                 max_target_boxes: int = 64,
                 answering_type: str = "generation",
                 dedup_queries: bool = False, dedup_bucket: int = None):
        if dedup_bucket is None:
            dedup_bucket = self.DEDUP_BUCKET
        self.vocab = vocab
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.max_query_len = max_query_len
        self.max_target_boxes = max_target_boxes
        self.answering_type = answering_type
        # dedup_queries: ALWAYS also emit the batch's unique query rows
        # (query_uniq_ids/valid (U,Tq), U padded up to a multiple of
        # dedup_bucket, capped at B) plus gather-back indices query_gather
        # (B,). The train step then runs frozen BERT on U rows instead of
        # B (multitask batches repeat the ~36 task templates across most
        # rows). Exact: identical token rows encode identically (BERT is
        # frozen + dropout-free). Emission is unconditional so the jit
        # batch pytree never toggles mid-epoch: executable variants are
        # bounded by the set of U values (bucket multiples up to B), not
        # by when a VQA-heavy batch happens to defeat dedup.
        self.dedup_queries = dedup_queries
        self.dedup_bucket = dedup_bucket

    def __call__(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        B = len(items)
        M = self.max_target_boxes
        queries = [it["query"] for it in items]
        query_ids, query_valid = self.tokenizer.batch_encode(
            queries, self.max_query_len)

        answers = [it.get("answer", "") for it in items]
        answer_ids = self.vocab.encode_answers(
            answers, self.max_text_len, self.answering_type)
        # true length = position of first pad (cls..stop inclusive)
        lens = (answer_ids != self.vocab.pad_id).sum(axis=1).astype(np.int32)

        boxes = np.zeros((B, M, 4), np.float32)
        box_valid = np.zeros((B, M), bool)
        has_boxes = np.zeros((B,), bool)
        for i, it in enumerate(items):
            if "boxes" in it:
                b = np.asarray(it["boxes"], np.float32).reshape(-1, 4)[:M]
                boxes[i, :len(b)] = b
                box_valid[i, :len(b)] = True
                has_boxes[i] = True

        batch = {
            "query_ids": query_ids,
            "query_valid": query_valid,
            "answer_ids": answer_ids,
            "answer_lens": lens,
            "task_id": np.asarray(
                [TASK_IDS.get(it["task"], 0) for it in items], np.int32),
            "has_answer": np.asarray(
                ["answer" in it for it in items], bool),
            "boxes": boxes,
            "box_labels": np.zeros((B, M), np.int32),
            "box_valid": box_valid,
            "has_boxes": has_boxes,
        }
        if self.dedup_queries:
            batch.update(self.dedup_emission(query_ids, query_valid,
                                             self.dedup_bucket))
        if "image" in items[0]:
            batch["image"] = np.stack([it["image"] for it in items])
        return batch

    @classmethod
    def dedup_emission(cls, query_ids: np.ndarray, query_valid: np.ndarray,
                       bucket: int = None) -> Dict[str, np.ndarray]:
        """The dedup fields for a batch of tokenized queries: unique rows
        padded up to a `bucket` multiple, CAPPED at B, plus gather-back
        indices. One definition shared by the collator and the train-step
        parity tests so they exercise the exact production emission."""
        if bucket is None:
            bucket = cls.DEDUP_BUCKET
        B = len(query_ids)
        uniq, first, inverse = np.unique(
            query_ids, axis=0, return_index=True, return_inverse=True)
        U = min(B, max(bucket,
                       ((len(uniq) + bucket - 1) // bucket) * bucket))
        pad = U - len(uniq)  # >= 0: len(uniq) <= B and U caps at B
        uniq_ids = np.concatenate(
            [uniq, np.broadcast_to(uniq[:1], (pad, uniq.shape[1]))])
        uniq_valid = np.concatenate(
            [query_valid[first],
             np.broadcast_to(query_valid[first[:1]],
                             (pad, query_valid.shape[1]))])
        return {
            "query_uniq_ids": np.ascontiguousarray(uniq_ids),
            "query_uniq_valid": np.ascontiguousarray(uniq_valid),
            "query_gather": inverse.astype(np.int32).reshape(B),
        }


class DataLoader:
    """Shuffling, fixed-batch, thread-pooled prefetching iterator."""

    def __init__(self, dataset, collator: Collator, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 8, seed: int = 0,
                 prefetch: int = 4, num_shards: int = 1, shard_id: int = 0):
        """`batch_size` is the GLOBAL batch; with num_shards > 1 (one shard
        per host process) every process iterates the same seeded global
        order and loads only its contiguous `batch_size // num_shards` rows
        of each batch — the multi-host analogue of DistributedSampler
        (reference train_distr.py:213-222), with rows laid out to match
        `shard_batch`'s process-local assembly."""
        assert batch_size % max(1, num_shards) == 0, (
            f"global batch {batch_size} not divisible by {num_shards} shards")
        if num_shards > 1 and not drop_last:
            # a trailing partial global batch splits unevenly across
            # shards (some processes would get EMPTY or shorter slices,
            # crashing the collator on one rank while the others proceed
            # — a cluster desync). Sharded iteration requires fixed-size
            # batches; the fixed-shape XLA step needs drop_last anyway.
            raise ValueError("num_shards > 1 requires drop_last=True")
        self.dataset = dataset
        self.collator = collator
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.num_shards = max(1, num_shards)
        self.shard_id = shard_id
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        nb = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.num_shards > 1:
            lb = self.batch_size // self.num_shards
            batches = [b[self.shard_id * lb:(self.shard_id + 1) * lb]
                       for b in batches]
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(bi: int, idxs: np.ndarray):
            # per-ITEM rng keyed by the row's GLOBAL position in the batch:
            # augmentation draws are then identical whether the batch is
            # assembled by 1 process or sharded over N (the "contiguous
            # rows of one global batch" contract is bit-exact, not just
            # index-exact — tested in test_data_pipeline.py)
            lb = self.batch_size // self.num_shards
            base = (self.seed * 1000003 + self.epoch * 9973
                    + bi * 131071) % (2 ** 31)
            items = []
            for j, i in enumerate(idxs):
                row = self.shard_id * lb + j
                rng = np.random.RandomState((base + row) % (2 ** 31))
                items.append(self.dataset.get(int(i), rng))
            return self.collator(items)

        def put(item) -> bool:
            """Queue-put that gives up if the consumer went away."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                import concurrent.futures as cf
                from collections import deque
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    # LAZY submission window: at most workers+prefetch
                    # batches in flight. Submitting the whole epoch upfront
                    # would let the pool race ahead of the consumer and
                    # accumulate every collated batch of the epoch in
                    # completed futures (multi-GB host RSS at 480x640x120).
                    window = self.num_workers + max(1, int(self.prefetch))
                    pending: deque = deque()
                    nxt = 0
                    while nxt < len(batches) and len(pending) < window:
                        pending.append(pool.submit(load_batch, nxt,
                                                   batches[nxt]))
                        nxt += 1
                    while pending:
                        f = pending.popleft()
                        if stop.is_set() or not put(("ok", f.result())):
                            for g in pending:
                                g.cancel()
                            break
                        if nxt < len(batches):
                            pending.append(pool.submit(load_batch, nxt,
                                                       batches[nxt]))
                            nxt += 1
            except Exception as e:  # surfaces in the consumer
                put(("err", e))
            finally:
                # the sentinel must be DELIVERED, not attempted: a single
                # timed put silently dropped it whenever the consumer was
                # slower than the producer (full prefetch queue at epoch
                # end), leaving the consumer blocked on get() forever —
                # an end-of-epoch hang on any host whose image loading
                # outpaces the train step. put() retries until delivered
                # or the consumer has left (stop set).
                put(("done", None))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    break
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
