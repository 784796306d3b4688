"""BERT-base query encoder (flax, frozen at GPV train time).

Behavior spec: reference `exp/gpv/models/bert.py` — HF `bert-base-uncased`
returning last hidden states (B, T, 768); GPV runs it under `no_grad` and
detaches, so it is effectively frozen (`gpv.py:142-145`). Rebuilt as a flax
module (12 post-norm layers, 12 heads, GELU-erf FFN 3072, LN eps 1e-12,
learned position + token-type embeddings); HF torch weights load through the
checkpoint converter. Freezing is handled by the optimizer partition (zero LR
on the `bert` subtree), which keeps the train graph static instead of
torch-style grad gating.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiHeadAttention

LN_EPS = 1e-12


class BertEmbeddings(nn.Module):
    vocab_size: int = 30522
    hidden: int = 768
    max_len: int = 512
    type_vocab: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        B, T = input_ids.shape
        we = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(T)[None, :]
        pe = nn.Embed(self.max_len, self.hidden, dtype=self.dtype,
                      name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        te = nn.Embed(self.type_vocab, self.hidden, dtype=self.dtype,
                      name="token_type_embeddings")(token_type_ids)
        x = we + pe + te
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="LayerNorm")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class BertLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        attn = MultiHeadAttention(self.hidden, self.heads, self.dropout,
                                  self.dtype, name="attention")(
            x, x, x, key_valid=valid, deterministic=deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                         name="attention_norm")(x + attn)
        h = nn.Dense(self.intermediate, dtype=self.dtype,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="output_norm")(x + h)


class BertEncoder(nn.Module):
    """12-layer BERT-base; returns last hidden states (B, T, 768)."""
    num_layers: int = 12
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 30522
    max_len: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, valid: Optional[jnp.ndarray] = None,
                 token_type_ids=None, deterministic=True):
        x = BertEmbeddings(self.vocab_size, self.hidden, self.max_len,
                           dropout=self.dropout,
                           dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        for i in range(self.num_layers):
            x = BertLayer(self.hidden, self.heads, self.intermediate,
                          self.dropout, self.dtype, name=f"layer{i}")(
                x, valid, deterministic)
        return x
