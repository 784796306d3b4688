"""DETR encoder-decoder transformer (post-norm, pos-embeds injected per layer).

Behavior spec: reference `exp/gpv/models/transformer.py` — 6+6 layers, d=256,
8 heads, FFN 2048, ReLU, positional encodings ADDED TO Q/K at every layer
(not to the input), decoder runs 100 learned queries from a zero target and
returns the per-layer intermediate states, each passed through the shared
final LayerNorm (all eps 1e-5, the torch nn.LayerNorm default — flax's 1e-6
default diverges sharply in the BACKWARD at decoder layer 0, where the
self-attn output is exactly zero at init and the LN grad scales by
1/sqrt(var+eps)). Batch-first (B, T, D) layout throughout (the reference's
(T, B, D) permutes are a torch MHA artifact with no TPU benefit).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiHeadAttention


class EncoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False  # reference forward_pre (transformer.py:162-174)

    @nn.compact
    def __call__(self, src, pos, key_valid=None, deterministic=True):
        attn_mod = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                      self.dtype, name="self_attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        linear1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")
        linear2 = nn.Dense(self.dim, dtype=self.dtype, name="linear2")

        def drop(x):
            return nn.Dropout(self.dropout, deterministic=deterministic)(x)

        if self.pre_norm:
            x = norm1(src)
            q = k = x + pos
            src = src + drop(attn_mod(q, k, x, key_valid=key_valid,
                                      deterministic=deterministic))
            x = norm2(src)
            return src + drop(linear2(drop(nn.relu(linear1(x)))))
        q = k = src + pos
        attn = attn_mod(q, k, src, key_valid=key_valid,
                        deterministic=deterministic)
        src = norm1(src + drop(attn))
        ff = linear2(drop(nn.relu(linear1(src))))
        return norm2(src + drop(ff))


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False  # reference forward_pre (transformer.py:235-260)

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos, mem_valid=None,
                 deterministic=True):
        self_attn = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                       self.dtype, name="self_attn")
        cross_attn = MultiHeadAttention(self.dim, self.num_heads,
                                        self.dropout, self.dtype,
                                        name="cross_attn")
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")
        linear1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")
        linear2 = nn.Dense(self.dim, dtype=self.dtype, name="linear2")

        def drop(x):
            return nn.Dropout(self.dropout, deterministic=deterministic)(x)

        if self.pre_norm:
            x = norm1(tgt)
            q = k = x + query_pos
            tgt = tgt + drop(self_attn(q, k, x,
                                       deterministic=deterministic))
            x = norm2(tgt)
            tgt = tgt + drop(cross_attn(x + query_pos, memory + mem_pos,
                                        memory, key_valid=mem_valid,
                                        deterministic=deterministic))
            x = norm3(tgt)
            return tgt + drop(linear2(drop(nn.relu(linear1(x)))))
        q = k = tgt + query_pos
        sa = self_attn(q, k, tgt, deterministic=deterministic)
        tgt = norm1(tgt + drop(sa))
        ca = cross_attn(tgt + query_pos, memory + mem_pos, memory,
                        key_valid=mem_valid, deterministic=deterministic)
        tgt = norm2(tgt + drop(ca))
        ff = linear2(drop(nn.relu(linear1(tgt))))
        return norm3(tgt + drop(ff))


class DetrTransformer(nn.Module):
    """Full DETR transformer: (B, HW, D) features -> (L, B, Q, D) query states."""
    dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    dropout: float = 0.1
    return_intermediate: bool = True
    remat: bool = False  # rematerialize layers (memory <-> flops trade)
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, pos, query_embed, key_valid=None,
                 deterministic=True):
        """src/pos: (B, HW, D); query_embed: (Q, D); key_valid: (B, HW) bool."""
        B = src.shape[0]
        # static_argnums include the module at index 0; `deterministic`
        # must stay a Python bool through remat (Dropout branches on it)
        Enc = nn.remat(EncoderLayer, static_argnums=(4,)) if self.remat \
            else EncoderLayer
        Dec = nn.remat(DecoderLayer, static_argnums=(6,)) if self.remat \
            else DecoderLayer
        memory = src
        for i in range(self.num_encoder_layers):
            memory = Enc(self.dim, self.num_heads, self.ffn_dim,
                         self.dropout, self.dtype, self.pre_norm,
                         name=f"encoder_layer{i}")(
                memory, pos, key_valid, deterministic)
        if self.pre_norm:
            # pre-norm encoders end un-normalized; the reference adds a
            # final encoder LayerNorm (transformer.py:27)
            memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="encoder_norm")(memory)

        query_pos = jnp.broadcast_to(query_embed[None].astype(self.dtype),
                                     (B, *query_embed.shape))
        tgt = jnp.zeros_like(query_pos)
        final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = Dec(self.dim, self.num_heads, self.ffn_dim,
                      self.dropout, self.dtype, self.pre_norm,
                      name=f"decoder_layer{i}")(
                tgt, memory, query_pos, pos, key_valid, deterministic)
            if self.return_intermediate:
                intermediate.append(final_norm(tgt))
        if self.return_intermediate:
            hs = jnp.stack(intermediate, axis=0)  # (L, B, Q, D)
        else:
            hs = final_norm(tgt)[None]
        return hs, memory
