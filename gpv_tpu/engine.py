"""GPVEngine: the user-facing inference runtime.

One jitted graph per (batch, image-size, decode-kind): on-device normalize ->
encode (ResNet/DETR/BERT/co-attention/relevance) -> KV-cached greedy or beam
decode -> relevance-sorted boxes. This is the TPU-native replacement for the
reference's `inference.py` / `compute_predictions.py` glue (preprocessing on
host, per-step python decode): everything between uint8 pixels and token ids
runs inside XLA.

Output contract matches `inference.py:24-47`: `answer: str`,
`boxes: (Q, 4) normalized cxcywh sorted by relevance`, `relevance: (Q,)`.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .decode import beam_decode, greedy_decode
from .models.gpv import GPV, build_gpv
from .ops.image import normalize_image
from .text.vocab import AnswerVocab
from .text.wordpiece import WordPieceTokenizer


class GPVEngine:
    def __init__(self, model: GPV, variables, vocab: AnswerVocab,
                 tokenizer: WordPieceTokenizer, max_query_len: int = 20,
                 fold_bn: bool = True, mesh=None, data_axis: str = None):
        """mesh: optional `jax.sharding.Mesh` for data-parallel inference —
        weights replicate, batch rows shard over `data_axis` (default: the
        mesh's first axis), and XLA partitions every jitted core SPMD
        (computation follows data; the jit signatures don't change). Batches
        whose size doesn't divide the axis pad by repeating the last row
        (same trick as GPVServer) and outputs slice back. The reference
        evaluates on exactly one GPU (`configs/exp/gpv.yaml:157-158`); this
        scales the same eval/serving graph across a TPU slice. The mesh must
        be fully addressable (single-process) — multi-host eval stays
        rank-0 (see train/trainer.py).
        """
        self.model = model
        self.fold_bn = fold_bn
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            if any(d.process_index != jax.process_index()
                   for d in mesh.devices.flat):
                raise ValueError(
                    "GPVEngine mesh must be fully addressable by this "
                    "process (multi-host eval is rank-0-only; build the "
                    "mesh over jax.local_devices())")
            axis = data_axis or mesh.axis_names[0]
            self._dp = int(mesh.shape[axis])
            self._sh_repl = NamedSharding(mesh, PartitionSpec())
            self._sh_batch = NamedSharding(mesh, PartitionSpec(axis))
        else:
            self._dp = 1
        self._vars_host = None
        self._vars_dev = None
        self.variables = variables
        self.vocab = vocab
        self.tokenizer = tokenizer
        self.max_query_len = max_query_len
        self._greedy = jax.jit(self._greedy_fn)
        self._beam = jax.jit(self._beam_fn,
                             static_argnames=("beam_size",))

    @property
    def variables(self):
        # Commit the weights to this process's default device ONCE, lazily.
        # fold_frozen_bn returns host numpy (and multi-host rank-0 eval
        # hands us numpy fetched from global arrays, trainer.py); passing
        # numpy leaves into the jitted cores would re-upload every weight on
        # EVERY predict call (measured: 23 s/batch over the dev relay vs
        # 40 ms with resident weights). Lazy so that processes that build an
        # engine but never predict (multi-host non-main ranks: eval/vis are
        # rank-0-only) never spend HBM on a second weight copy.
        if self._vars_dev is None and self._vars_host is not None:
            self._vars_dev = (jax.device_put(self._vars_host, self._sh_repl)
                              if self.mesh is not None
                              else jax.device_put(self._vars_host))
            self._vars_host = None
        return self._vars_dev

    @variables.setter
    def variables(self, value):
        # serving-path weight folding (see ops/fold_bn.py) applied whenever
        # fresh variables are installed
        if value is not None and self.fold_bn and "batch_stats" in value \
                and value["batch_stats"]:
            from .ops.fold_bn import fold_frozen_bn
            p, s = fold_frozen_bn(value["params"], value["batch_stats"])
            value = {"params": p, "batch_stats": s}
        self._vars_host = value
        self._vars_dev = None

    @classmethod
    def from_config(cls, model_cfg, vocab: AnswerVocab,
                    tokenizer: WordPieceTokenizer, variables=None,
                    dtype=jnp.bfloat16, seed: int = 0,
                    max_query_len: int = 20, mesh=None):
        model = build_gpv(model_cfg, vocab_size=len(vocab), dtype=dtype)
        # queries can never exceed the BERT position table
        max_query_len = min(max_query_len, model.bert_max_len)
        if variables is None:
            rng = jax.random.PRNGKey(seed)
            imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
            qids = jnp.zeros((1, 4), jnp.int32)
            aids = jnp.zeros((1, 4), jnp.int32)
            variables = model.init(rng, imgs, qids, aids, train=False)
        return cls(model, variables, vocab, tokenizer,
                   max_query_len=max_query_len, mesh=mesh)

    # ---- jitted cores ----

    def _encode(self, variables, images_f32, query_ids, query_valid,
                image_valid=None):
        # accepts uint8 (the host API ships raw bytes — 4x less transfer
        # than host-side float32) or float32; the cast runs on device
        images = normalize_image(images_f32.astype(jnp.float32) / 255.0)
        memory, mem_valid, outputs = self.model.apply(
            variables, images, query_ids, image_valid=image_valid,
            query_valid=query_valid, method=GPV.encode)
        rel = jax.nn.softmax(
            outputs["pred_relevance_logits"].astype(jnp.float32), -1)[..., 0]
        order = jnp.argsort(-rel, axis=-1)
        boxes = jnp.take_along_axis(
            outputs["pred_boxes"].astype(jnp.float32),
            order[..., None], axis=1)
        rel_sorted = jnp.take_along_axis(rel, order, axis=1)
        return memory, mem_valid, boxes, rel_sorted

    def _greedy_fn(self, variables, images_f32, query_ids, query_valid,
                   vocab_mask, image_valid=None):
        memory, mem_valid, boxes, rel = self._encode(
            variables, images_f32, query_ids, query_valid, image_valid)
        tokens, logits = greedy_decode(self.model, variables, memory,
                                       mem_valid, self.vocab.cls_id,
                                       vocab_mask,
                                       stop_id=self.vocab.stop_id)
        return tokens, boxes, rel

    def _beam_fn(self, variables, images_f32, query_ids, query_valid,
                 vocab_mask, beam_size):
        memory, mem_valid, boxes, rel = self._encode(
            variables, images_f32, query_ids, query_valid)
        seqs, logp = beam_decode(self.model, variables, memory, mem_valid,
                                 self.vocab.cls_id, beam_size, vocab_mask)
        return seqs, logp, boxes, rel

    # ---- host API ----

    @staticmethod
    def _pad_rows(arr: np.ndarray, pad: int) -> np.ndarray:
        # pad a batch to a static shape by repeating the last row (the
        # duplicate rows compute real-but-discarded results; outputs slice
        # back to the caller's n)
        if not pad:
            return arr
        return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])

    def _put_batch(self, arr):
        # under a mesh, device_put straight from host numpy lands each
        # shard on its owning device (jnp.asarray first would stage the
        # whole batch on device 0 and pay a second device-to-device hop)
        a = np.asarray(arr)
        return (jax.device_put(a, self._sh_batch)
                if self.mesh is not None else jnp.asarray(a))

    def _put_repl(self, arr):
        if arr is None:
            return None
        a = np.asarray(arr)
        return (jax.device_put(a, self._sh_repl)
                if self.mesh is not None else jnp.asarray(a))

    def _prep(self, images_uint8: np.ndarray, queries: List[str]):
        # ship uint8 to device; the jitted core casts/normalizes there.
        # Under a mesh, the batch dim must divide the data axis: pad by
        # repetition, and return the pad so callers slice outputs.
        pad = (-len(queries)) % self._dp if queries else 0
        images = self._pad_rows(np.asarray(images_uint8), pad)
        qids, qvalid = self.tokenizer.batch_encode(
            list(queries) + ([queries[-1]] * pad if pad else []),
            self.max_query_len)
        return (self._put_batch(images), self._put_batch(qids),
                self._put_batch(qvalid), pad)

    def predict(self, images_uint8, queries: List[str],
                vocab_mask: Optional[np.ndarray] = None):
        """Batched greedy prediction.

        Args:
          images_uint8: (B, H, W, 3) uint8 (any fixed H, W per call).
          queries: list of B strings.

        Returns list of B dicts {answer, boxes, relevance}.
        """
        images, qids, qvalid, _ = self._prep(images_uint8, queries)
        vm = self._put_repl(vocab_mask)
        tokens, boxes, rel = self._greedy(self.variables, images, qids,
                                          qvalid, vm)
        n = len(queries)
        answers = self.vocab.decode_ids(np.asarray(tokens)[:n])
        boxes, rel = np.asarray(boxes)[:n], np.asarray(rel)[:n]
        return [{"answer": answers[i], "boxes": boxes[i],
                 "relevance": rel[i]} for i in range(n)]

    def predict_native(self, images_uint8: List[np.ndarray],
                       queries: List[str],
                       vocab_mask: Optional[np.ndarray] = None,
                       bucket: int = 64):
        """Batched inference at NATIVE resolutions (the reference
        `inference.py` no-resize path, generalized to batches).

        Images are grouped into shape buckets: each is zero-padded up to the
        bucket's (H, W) (rounded up to multiples of `bucket`) with a validity
        mask, so one compiled executable serves a whole bucket — the
        'bucketed padded shapes + mask' design SURVEY.md §7 calls for.
        """
        def bshape(img):
            h, w = img.shape[:2]
            return (-(-h // bucket) * bucket, -(-w // bucket) * bucket)

        groups: dict = {}
        for i, img in enumerate(images_uint8):
            groups.setdefault(bshape(img), []).append(i)

        results: list = [None] * len(images_uint8)
        for (bh, bw), idxs in groups.items():
            pad = (-len(idxs)) % self._dp
            batch = np.zeros((len(idxs) + pad, bh, bw, 3), np.uint8)
            valid = np.zeros((len(idxs) + pad, bh, bw), bool)
            for j, i in enumerate(idxs + idxs[-1:] * pad):
                img = images_uint8[i]
                h, w = img.shape[:2]
                batch[j, :h, :w] = img
                valid[j, :h, :w] = True
            qids, qvalid = self.tokenizer.batch_encode(
                [queries[i] for i in idxs + idxs[-1:] * pad],
                self.max_query_len)
            vm = self._put_repl(vocab_mask)
            tokens, boxes, rel = self._greedy(
                self.variables, self._put_batch(batch),
                self._put_batch(qids), self._put_batch(qvalid), vm,
                self._put_batch(valid))
            answers = self.vocab.decode_ids(np.asarray(tokens))
            boxes, rel = np.asarray(boxes), np.asarray(rel)
            for j, i in enumerate(idxs):
                results[i] = {"answer": answers[j], "boxes": boxes[j],
                              "relevance": rel[j]}
        return results

    def predict_beam(self, images_uint8, queries: List[str],
                     beam_size: int = 5,
                     vocab_mask: Optional[np.ndarray] = None,
                     reference_quirks: bool = False):
        """Batched beam-search prediction; returns per-sample
        {answers: [str x K], answer_probs: [float x K], boxes, relevance}
        (contract of `inference_beam_search.py:25-45`).

        reference_quirks=True reproduces the reference beam tail bug
        (phantom `vocab[0]` word appended to a beam that never emitted
        stop, gpv.py:316-327 — see AnswerVocab.decode_beam_ids) for
        string-level parity with upstream eval outputs. Serving and the
        default API return the clean decode.
        """
        images, qids, qvalid, _ = self._prep(images_uint8, queries)
        vm = self._put_repl(vocab_mask)
        seqs, logp, boxes, rel = self._beam(self.variables, images, qids,
                                            qvalid, vm, beam_size)
        n = len(queries)
        seqs = np.asarray(seqs)[:n]
        probs = np.exp(np.asarray(logp)[:n])
        boxes, rel = np.asarray(boxes)[:n], np.asarray(rel)[:n]
        out = []
        for i in range(len(queries)):
            if reference_quirks:
                answers = self.vocab.decode_beam_ids(seqs[i])
            else:
                answers = self.vocab.decode_ids(seqs[i])
            out.append({"answers": answers,
                        "answer_probs": probs[i].tolist(),
                        "boxes": boxes[i], "relevance": rel[i]})
        return out
