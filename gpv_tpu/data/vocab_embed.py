"""Vocab-embedding generator: BERT CLS embedding per answer-vocab word.

Behavior spec: reference `exp/gpv/compute_vocab_bert.py:8-29` — embed every
vocab word with BERT and take the CLS-position output -> `vocab_embed.npy`
(V x 768). This feeds the fixed answer-head classifier matrix. Runs the flax
BERT in batches on device.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.bert import BertEncoder
from ..text.wordpiece import WordPieceTokenizer


def embed_vocab(vocab: list[str], tokenizer: WordPieceTokenizer,
                bert_params=None, batch_size: int = 256,
                bert_kwargs: dict | None = None) -> np.ndarray:
    """-> (V, hidden) fp32 CLS embeddings."""
    model = BertEncoder(**(bert_kwargs or {}))
    if bert_params is None:
        ids0, valid0 = tokenizer.batch_encode(vocab[:1], 8)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                               valid=jnp.asarray(valid0))
        bert_params = variables["params"]

    @jax.jit
    def run(ids, valid):
        out = model.apply({"params": bert_params}, ids, valid=valid)
        return out[:, 0]  # CLS position

    outs = []
    for start in range(0, len(vocab), batch_size):
        chunk = vocab[start:start + batch_size]
        ids, valid = tokenizer.batch_encode(chunk, 16)
        outs.append(np.asarray(run(jnp.asarray(ids), jnp.asarray(valid))))
    return np.concatenate(outs, axis=0).astype(np.float32)


def write_vocab_embed(embed: np.ndarray, out_path: str | Path):
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(out_path, embed)
    return out_path
