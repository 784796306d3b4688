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


def _attend_cell(q_ref, k_ref, v_ref, mask_ref, out_ref):
    """One (batch, head) attention cell, shared by every kernel here.

    Blocks (B,H,T,Dh layout): q (1, 1, Tq, Dh), k/v (1, 1, Tk, Dh),
    mask (1, Tq, Tk) additive fp32 or None (maskless variant — no zero
    tensor is streamed through HBM/VMEM for the unmasked case). QK^T ->
    (+mask) -> max-subtracted softmax -> PV, all VMEM-resident, fp32
    accumulation on the MXU.
    """
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    dh = q.shape[-1]
    scores = jax.lax.dot_general(
        q * (1.0 / dh ** 0.5), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Tq, Tk)
    if mask_ref is not None:
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
    has_mask = mask is not None
    if has_mask:
        mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, Tq, Tk))

    # (B, H, T, Dh) layout keeps the (T, Dh) tile in the minor dims
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    spec = lambda T: pl.BlockSpec((1, 1, T, Dh), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [spec(Tq), spec(Tk), spec(Tk)]
    operands = [qt, kt, vt]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, Tq, Tk), lambda b, h: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = _attend_cell
    else:
        kernel = lambda q_ref, k_ref, v_ref, out_ref: \
            _attend_cell(q_ref, k_ref, v_ref, None, out_ref)

    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=spec(Tq),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dh), q.dtype),
        interpret=interpret,
    )(*operands)
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


def _make_biattn_kernel(has_m1: bool, has_m2: bool):
    """Both co-attention directions in one VMEM-resident cell.

    Blocks (B,H,T,Dh layout): stream tiles (1, 1, T, Dh); masks
    (1, T2, T1) / (1, T1, T2) additive fp32, each present only when the
    corresponding stream has a validity mask (no zero tensors streamed
    for the unmasked directions).
    ctx1 = softmax(q2 k1^T + m1) v1   (stream2 reading stream1)
    ctx2 = softmax(q1 k2^T + m2) v2   (stream1 reading stream2)
    """
    def kernel(*refs):
        q1_ref, k1_ref, v1_ref, q2_ref, k2_ref, v2_ref = refs[:6]
        i = 6
        m1_ref = refs[i] if has_m1 else None
        i += int(has_m1)
        m2_ref = refs[i] if has_m2 else None
        ctx1_ref, ctx2_ref = refs[-2:]
        _attend_cell(q2_ref, k1_ref, v1_ref, m1_ref, ctx1_ref)
        _attend_cell(q1_ref, k2_ref, v2_ref, m2_ref, ctx2_ref)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_biattention(q1, k1, v1, q2, k2, v2,
                      valid1: Optional[jnp.ndarray] = None,
                      valid2: Optional[jnp.ndarray] = None,
                      interpret: bool = False):
    """ViLBERT bi-attention, both directions in one Pallas pass.

    Args: per-stream projections (B, T_s, H, Dh); valid_s optional (B, T_s)
    key-validity for stream s's KEYS.
    Returns (ctx1, ctx2): (B, T2, H, Dh) and (B, T1, H, Dh) in input dtype.

    Built for the item-8 train-shapes experiment (BASELINE.md "r5 pallas
    co-attention"): at GPV dims every tile of a (batch, head) cell — six
    (T<=100, 48) stream tiles plus the two score matrices — fits VMEM
    together, so one kernel removes the HBM round-trips XLA schedules
    between the two attention directions and halves the launch count.
    """
    B, T1, H, Dh = q1.shape
    T2 = q2.shape[1]

    t = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    spec = lambda T: pl.BlockSpec((1, 1, T, Dh), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
    mspec = lambda Tq, Tk: pl.BlockSpec((1, Tq, Tk), lambda b, h: (b, 0, 0),
                                        memory_space=pltpu.VMEM)
    in_specs = [spec(T1), spec(T1), spec(T1), spec(T2), spec(T2), spec(T2)]
    operands = [t(q1), t(k1), t(v1), t(q2), t(k2), t(v2)]
    if valid1 is not None:  # stream2 queries over stream1 keys
        in_specs.append(mspec(T2, T1))
        operands.append(attention_mask(valid1, None, B, T2, T1))
    if valid2 is not None:
        in_specs.append(mspec(T1, T2))
        operands.append(attention_mask(valid2, None, B, T1, T2))

    ctx1, ctx2 = pl.pallas_call(
        _make_biattn_kernel(valid1 is not None, valid2 is not None),
        grid=(B, H),
        in_specs=in_specs,
        out_specs=[spec(T2), spec(T1)],
        out_shape=[jax.ShapeDtypeStruct((B, H, T2, Dh), q1.dtype),
                   jax.ShapeDtypeStruct((B, H, T1, Dh), q1.dtype)],
        interpret=interpret,
    )(*operands)
    return t(ctx1), t(ctx2)
