"""ViLBERT-style bi-directional co-attention fusion.

Behavior spec: reference `exp/gpv/models/vilbert.py` `BertConnectionLayer`
(:859) = `BertBiAttention` (:696, 16 heads over 768-d: stream A queries attend
stream B keys/values and vice versa, two independent softmax attentions) +
`BertBiOutput` (:827, per-stream dense + residual + LayerNorm eps 1e-12) +
per-stream GELU FFN (3072). GPV stacks 3 of these with
`input_tensor1 = text (lv)`, `input_tensor2 = vision queries (vl)`
(`gpv.py:147-154`) and no attention masks; we support optional validity masks
for padded batches.

Naming note: the reference routes stream1 through the "v_*" FFN weights and
stream2 through the "t_*" ones (an upstream quirk — both are 768/3072 so the
math is symmetric). Here streams are named plainly: stream1/stream2 with
`ffn1`/`ffn2`.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

LN_EPS = 1e-12


class BiAttention(nn.Module):
    """Cross-stream attention: returns (ctx1, ctx2).

    ctx1 = softmax(Q2 K1^T) V1  (stream2 reading stream1)
    ctx2 = softmax(Q1 K2^T) V2  (stream1 reading stream2)

    Per-stream attention dropout mirrors the reference's `dropout1 =
    v_attention_probs_dropout_prob` / `dropout2 = attention_probs_dropout_
    prob` (vilbert.py:720,727); `dropout2_rate=None` ties both to
    `dropout` (GPV's config interpolates all of them to detr.dropout).
    """
    dim: int = 768
    num_heads: int = 16
    dropout: float = 0.1          # stream1 ('v_') attention dropout
    dropout2_rate: float | None = None  # stream2 attention dropout
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, valid1=None, valid2=None, deterministic=True):
        H = self.num_heads
        Dh = self.dim // H

        def qkv(name, x):
            y = nn.Dense(self.dim, dtype=self.dtype, name=name)(x)
            return y.reshape(*x.shape[:-1], H, Dh)

        q1, k1, v1 = (qkv(f"{n}1", x1) for n in ("query", "key", "value"))
        q2, k2, v2 = (qkv(f"{n}2", x2) for n in ("query", "key", "value"))
        scale = jnp.asarray(1.0 / Dh ** 0.5, self.dtype)

        rate2 = self.dropout if self.dropout2_rate is None \
            else self.dropout2_rate
        # Fused Pallas path (opt-in, GPV_TPU_PALLAS=1): both directions in
        # one kernel. Deterministic (inference) forward ONLY — pallas_call
        # has no registered VJP, so the training path (even at dropout 0)
        # must stay on the differentiable einsum formulation. Measured at
        # train shapes in BASELINE.md "r5 pallas co-attention".
        from ..ops.attention import fused_biattention, pallas_enabled
        if pallas_enabled() and deterministic:
            ctx1, ctx2 = fused_biattention(q1, k1, v1, q2, k2, v2,
                                           valid1, valid2)
            D = self.dim
            return (ctx1.reshape(*ctx1.shape[:-2], D).astype(self.dtype),
                    ctx2.reshape(*ctx2.shape[:-2], D).astype(self.dtype))

        def attend(q, k, v, valid, name, rate):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if valid is not None:
                logits = jnp.where(valid[:, None, None, :], logits, -1e9)
            p = nn.softmax(logits, axis=-1).astype(self.dtype)
            p = nn.Dropout(rate, deterministic=deterministic,
                           name=name)(p)
            out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                             preferred_element_type=jnp.float32)
            return out.reshape(*out.shape[:-2], self.dim).astype(self.dtype)

        ctx1 = attend(q2, k1, v1, valid1, "drop1", self.dropout)  # (B,T2,D)
        ctx2 = attend(q1, k2, v2, valid2, "drop2", rate2)         # (B,T1,D)
        return ctx1, ctx2


def _act(name: str):
    acts = {"gelu": lambda x: nn.gelu(x, approximate=False),
            "relu": nn.relu, "swish": nn.swish}
    if name not in acts:  # same loud failure as the reference's ACT2FN
        raise ValueError(f"unsupported co-attention activation {name!r} "
                         f"(expected one of {sorted(acts)})")
    return acts[name]


class CoAttentionLayer(nn.Module):
    """One fusion block: bi-attention + per-stream residual/LN + FFN.

    Per-stream knobs mirror the reference config surface: stream1 is the
    'v_*' path (v_attention_probs/hidden_dropout_prob, v_intermediate_size,
    v_hidden_act — vilbert.py:827-900), stream2 the plain one. `None` ties
    a stream-2 knob to stream 1, matching GPV's all-tied interpolations.
    """
    dim: int = 768
    num_heads: int = 16
    intermediate: int = 3072          # stream1 ('v_') FFN width
    dropout: float = 0.1              # stream1 hidden + attn dropout
    intermediate2: int | None = None  # stream2 FFN width
    dropout2: float | None = None     # stream2 hidden dropout
    attn_dropout: float | None = None   # stream1 attention dropout
    attn_dropout2: float | None = None  # stream2 attention dropout
    act: str = "gelu"                 # stream1 FFN activation
    act2: str | None = None           # stream2 FFN activation
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, valid1=None, valid2=None, deterministic=True):
        attn_rate1 = self.dropout if self.attn_dropout is None \
            else self.attn_dropout
        attn_rate2 = attn_rate1 if self.attn_dropout2 is None \
            else self.attn_dropout2
        ctx1, ctx2 = BiAttention(self.dim, self.num_heads, attn_rate1,
                                 attn_rate2, self.dtype, name="biattention")(
            x1, x2, valid1, valid2, deterministic)
        rate2 = self.dropout if self.dropout2 is None else self.dropout2
        drop1 = nn.Dropout(self.dropout, deterministic=deterministic)
        drop2 = nn.Dropout(rate2, deterministic=deterministic)
        # stream1 absorbs what it read from stream2 (ctx2) and vice versa
        a1 = nn.Dense(self.dim, dtype=self.dtype, name="dense1")(ctx2)
        a1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                          name="attn_norm1")(x1 + drop1(a1))
        a2 = nn.Dense(self.dim, dtype=self.dtype, name="dense2")(ctx1)
        a2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                          name="attn_norm2")(x2 + drop2(a2))

        def ffn(x, tag, width, act_name, drop):
            h = nn.Dense(width, dtype=self.dtype, name=f"ffn_in{tag}")(x)
            h = _act(act_name)(h)
            h = drop(nn.Dense(self.dim, dtype=self.dtype,
                              name=f"ffn_out{tag}")(h))
            return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name=f"ffn_norm{tag}")(x + h)

        inter2 = self.intermediate if self.intermediate2 is None \
            else self.intermediate2
        act2 = self.act if self.act2 is None else self.act2
        return (ffn(a1, "1", self.intermediate, self.act, drop1),
                ffn(a2, "2", inter2, act2, drop2))
