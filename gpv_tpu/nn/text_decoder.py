"""Answer text decoder with KV-cached incremental decoding.

Behavior spec: torch `nn.TransformerDecoder(nn.TransformerDecoderLayer(
d_model=768, nhead=8, dropout=0.1), num_layers=3)` as built by the reference
(`exp/gpv/models/gpv.py:37-43`): post-norm, ReLU, FFN 2048, causal self-attn
mask built per call (`gpv.py:456-463`), no final norm.

TPU redesign: the reference re-encodes the WHOLE prefix every greedy/beam step
(`gpv.py:178-196`). Here the teacher-forced path is one fused call, and the
sampling path uses `precompute_memory` (cross-attention K/V computed once) +
`step` (one-token self-attention against a static-shape KV cache), driven by
`lax.scan` in `gpv_tpu.decode`. This is the main inference-throughput win.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiHeadAttention


def causal_mask(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) additive causal mask: 0 on/below diagonal, -inf above."""
    return jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e9).astype(dtype)


class TextDecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.dim, self.num_heads,
                                            self.dropout, self.dtype)
        self.cross_attn = MultiHeadAttention(self.dim, self.num_heads,
                                             self.dropout, self.dtype)
        self.linear1 = nn.Dense(self.ffn_dim, dtype=self.dtype)
        self.linear2 = nn.Dense(self.dim, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x, deterministic):
        h = self.drop(nn.relu(self.linear1(x)), deterministic=deterministic)
        return self.drop(self.linear2(h), deterministic=deterministic)

    def __call__(self, tgt, memory, mem_valid=None, deterministic=True):
        T = tgt.shape[1]
        sa = self.self_attn(tgt, tgt, tgt,
                            attn_mask=causal_mask(T),
                            deterministic=deterministic)
        tgt = self.norm1(tgt + self.drop(sa, deterministic=deterministic))
        ca = self.cross_attn(tgt, memory, memory, key_valid=mem_valid,
                             deterministic=deterministic)
        tgt = self.norm2(tgt + self.drop(ca, deterministic=deterministic))
        return self.norm3(tgt + self._ffn(tgt, deterministic))

    def precompute_memory(self, memory):
        """Cross-attention K/V, computed once per decode: (B,Tm,H,Dh) x2."""
        return self.cross_attn.project_kv(memory, memory)

    def step(self, x_t, mem_kv, mem_valid, cache_k, cache_v, t,
             beam_group: int = 1):
        """One incremental token.

        Args:
          x_t: (B, 1, D) current-position input.
          mem_kv: precomputed (mem_k, mem_v).
          cache_k/cache_v: (B, S_max, H, Dh) self-attention KV cache.
          t: scalar int32 position.
          beam_group: static K>1 marks x_t as B*K sample-major beam rows
            whose mem_kv/mem_valid stay UNTILED at (B//K,·): the K beams of
            one sample share cross-attention K/V, so the beam axis rides
            `attend`'s query-sequence axis instead — the per-step HBM reads
            of the (Tm,H,Dh) memory K/V drop K-fold and nothing is tiled.
            Identical math to calling with pre-repeated mem_kv.

        Returns: (y_t (B,1,D), cache_k, cache_v).
        """
        B = x_t.shape[0]
        qh = self.self_attn.project_q(x_t)  # (B,1,H,Dh)
        kh_t, vh_t = self.self_attn.project_kv(x_t, x_t)
        cache_k = cache_k.at[:, t].set(kh_t[:, 0])
        cache_v = cache_v.at[:, t].set(vh_t[:, 0])
        S = cache_k.shape[1]
        pos_valid = (jnp.arange(S) <= t)[None, :]  # (1,S)
        sa = self.self_attn.attend(
            qh, cache_k, cache_v,
            key_valid=jnp.broadcast_to(pos_valid, (B, S)))
        x = self.norm1(x_t + sa)
        mem_k, mem_v = mem_kv
        q = self.cross_attn.project_q(x)  # (B,1,H,Dh)
        if beam_group > 1:
            qb = q.reshape(B // beam_group, beam_group, *q.shape[2:])
            ca = self.cross_attn.attend(qb, mem_k, mem_v,
                                        key_valid=mem_valid)  # (B/K,K,D)
            ca = ca.reshape(B, 1, ca.shape[-1])
        else:
            ca = self.cross_attn.attend(q, mem_k, mem_v, key_valid=mem_valid)
        x = self.norm2(x + ca)
        y = self.norm3(x + self._ffn(x, True))
        return y, cache_k, cache_v


class TextDecoder(nn.Module):
    """Stack of TextDecoderLayers; torch TransformerDecoder semantics."""
    dim: int = 768
    num_heads: int = 8
    num_layers: int = 3
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TextDecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                             self.dropout, self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)]

    def __call__(self, tgt, memory, mem_valid=None, deterministic=True):
        for layer in self.layers:
            tgt = layer(tgt, memory, mem_valid, deterministic)
        return tgt

    def precompute_memory(self, memory):
        return tuple(layer.precompute_memory(memory) for layer in self.layers)

    def init_cache(self, batch: int, max_len: int):
        head_dim = self.dim // self.num_heads
        shape = (batch, max_len, self.num_heads, head_dim)
        z = jnp.zeros(shape, self.dtype)
        return tuple((z, z) for _ in range(self.num_layers))

    def step(self, x_t, mem_kvs, mem_valid, caches, t, beam_group: int = 1):
        """One token through all layers; returns (y_t, new_caches)."""
        new_caches = []
        for layer, mem_kv, (ck, cv) in zip(self.layers, mem_kvs, caches):
            x_t, ck, cv = layer.step(x_t, mem_kv, mem_valid, ck, cv, t,
                                     beam_group=beam_group)
            new_caches.append((ck, cv))
        return x_t, tuple(new_caches)
