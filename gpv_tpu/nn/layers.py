"""Core neural-net building blocks (flax.linen, TPU-friendly layouts).

Math parity targets:
- `MultiHeadAttention`: torch `nn.MultiheadAttention` semantics (scale q by
  1/sqrt(head_dim), additive key-padding masking, attention dropout) used by
  the reference DETR transformer (`exp/gpv/models/transformer.py`) and text
  decoder. Implemented with einsum over (B, T, H, Dh) so XLA maps the
  contractions straight onto the MXU; the packed torch in_proj layout is
  handled by the checkpoint converter, not the module.
- `MLP`: DETR's ReLU box-head MLP (`exp/gpv/models/detr_roi_head.py:108`).
- `FrozenBatchNorm`: inference-style BN with folded scale/bias
  (`exp/gpv/models/backbone.py:19-55`), channel-last.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    """Multi-head attention over (B, T, D) streams.

    Exposes separate q/k/v projection helpers so decode loops can cache K/V
    (`project_kv` once, then `attend` per step). Key padding mask: True=VALID.
    """
    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.dim % self.num_heads == 0
        self.q_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.k_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.v_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, self.head_dim)

    def project_q(self, q):
        return self._split(self.q_proj(q))

    def project_kv(self, k, v):
        return self._split(self.k_proj(k)), self._split(self.v_proj(v))

    def attend(self, qh, kh, vh, key_valid=None, attn_mask=None,
               deterministic: bool = True):
        """qh: (B,Tq,H,Dh), kh/vh: (B,Tk,H,Dh) -> (B,Tq,D)."""
        B, Tq = qh.shape[:2]
        # Fused Pallas kernel path (opt-in via GPV_TPU_PALLAS=1).
        # Deterministic (inference) forward ONLY — pallas_call has no
        # registered VJP, so the training path (even at dropout 0) must
        # stay on the differentiable einsum formulation below.
        from ..ops.attention import (attention_mask, fused_attention,
                                     pallas_enabled)
        if pallas_enabled() and deterministic:
            Tk = kh.shape[1]
            mask = attention_mask(key_valid, attn_mask, B, Tq, Tk)
            out = fused_attention(qh, kh, vh, mask)
            out = out.reshape(B, Tq, self.dim).astype(self.dtype)
            return self.out_proj(out)
        scale = jnp.asarray(1.0 / self.head_dim ** 0.5, qh.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:  # additive, broadcastable to (B?,H?,Tq,Tk)
            logits = logits + attn_mask
        if key_valid is not None:
            neg = jnp.asarray(-1e9, logits.dtype)
            logits = jnp.where(key_valid[:, None, None, :], logits, neg)
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = self.attn_drop(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Tq, self.dim).astype(self.dtype)
        return self.out_proj(out)

    def __call__(self, q, k, v, key_valid: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        qh = self.project_q(q)
        kh, vh = self.project_kv(k, v)
        return self.attend(qh, kh, vh, key_valid, attn_mask, deterministic)


class MLP(nn.Module):
    """ReLU MLP: num_layers Dense layers, ReLU between (not after last)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params (channel-last).

    Stores weight/bias/running_mean/running_var as non-trainable variables in
    the `batch_stats` collection; forward folds them into a single
    scale-and-shift so XLA fuses it into the surrounding convs.
    """
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.variable("batch_stats", "weight",
                               lambda: jnp.ones((self.features,), jnp.float32))
        bias = self.variable("batch_stats", "bias",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        mean = self.variable("batch_stats", "running_mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "running_var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        scale = weight.value * jnp.reciprocal(
            jnp.sqrt(var.value + self.eps))
        shift = bias.value - mean.value * scale
        return (x * scale.astype(self.dtype)
                + shift.astype(self.dtype)).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, fp32 statistics (torch eps default 1e-5)."""
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)
