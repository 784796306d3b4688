"""Fused multi-head attention as a Pallas TPU kernel.

One kernel serves every attention in the model (DETR encoder/decoder, BERT,
co-attention, text decoder): GPV sequences are short (<=512: ~300 DETR
tokens, 100 queries, <=30 text tokens), so a whole (Tq, Tk) score tile fits
VMEM and the kernel runs one (batch, head) pair per grid cell — fusing
QK^T -> (+mask) -> softmax -> PV into a single VMEM-resident pass with fp32
accumulation on the MXU, no HBM round-trip for the score matrix.

Opt-in via `use_pallas=True` on the callers (or GPV_TPU_PALLAS=1); the
XLA einsum path remains the default and the parity reference.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    # blocks (B,H,T,Dh layout): q (1, 1, Tq, Dh), k/v (1, 1, Tk, Dh),
    # mask (1, Tq, Tk)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    dh = q.shape[-1]
    scores = jax.lax.dot_general(
        q * (1.0 / dh ** 0.5), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Tq, Tk)
    scores = scores + mask_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention.

    Args:
      q: (B, Tq, H, Dh); k, v: (B, Tk, H, Dh).
      mask: optional additive fp32 mask broadcastable to (B, Tq, Tk)
        (use -1e9 for banned keys; combine causal/padding before the call).

    Returns (B, Tq, H, Dh) in q's dtype.
    """
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    if mask is None:
        mask = jnp.zeros((B, Tq, Tk), jnp.float32)
    else:
        mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, Tq, Tk))

    # (B, H, T, Dh) layout keeps the (T, Dh) tile in the minor dims
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    grid = (B, H)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Tq, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tq, Tk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Tq, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, mask)
    return jnp.transpose(out, (0, 2, 1, 3))


def pallas_enabled() -> bool:
    return os.environ.get("GPV_TPU_PALLAS", "0") == "1"


def attention_mask(key_valid: Optional[jnp.ndarray],
                   attn_mask: Optional[jnp.ndarray],
                   B: int, Tq: int, Tk: int) -> Optional[jnp.ndarray]:
    """Combine a (B, Tk) validity mask and an additive (.., Tq, Tk) mask
    into the (B, Tq, Tk) additive form `fused_attention` takes."""
    mask = None
    if attn_mask is not None:
        m = attn_mask.astype(jnp.float32)
        while m.ndim > 3:  # drop broadcast head axes
            m = m[:, 0] if m.shape[1] == 1 else m.max(axis=1)
        mask = jnp.broadcast_to(m, (B, Tq, Tk))
    if key_valid is not None:
        kv = jnp.where(key_valid[:, None, :], 0.0, _NEG).astype(jnp.float32)
        kv = jnp.broadcast_to(kv, (B, Tq, Tk))
        mask = kv if mask is None else mask + kv
    return mask
