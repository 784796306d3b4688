"""Fully batched beam search (replaces the reference's Python triple loops).

Behavior spec: reference `GPV.beam_decode_text` (`exp/gpv/models/gpv.py:
256-362`): K beams, per step each beam proposes its top-K continuations, the
K1*K2 candidates are re-ranked by accumulated log-prob, and at t=0 all but
beam 0 are suppressed (`:281-282`, score*0-1e9). Note the reference's
`seen_stop` freeze (`update_seq_log_prob`, :330-344) is dead code — the
`tensor is True` comparison never fires — so the effective semantics are plain
accumulated-log-prob beam search including post-stop tokens, which is exactly
what we implement (bit-for-bit candidate ordering: candidates are ranked by
score with ties broken in (k1, k2) order, matching the stable Python sort).

TPU design: all K beams advance as one batch of B*K KV-cached decoder calls
inside `lax.scan`; beam reordering is a gather over the cache's beam axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gpv import GPV
from .greedy import init_cache

NEG_INF = -1e9


def beam_decode(model: GPV, variables, memory: jnp.ndarray,
                mem_valid: Optional[jnp.ndarray], cls_id: int,
                beam_size: int,
                vocab_mask: Optional[jnp.ndarray] = None):
    """Beam-search answers.

    Args:
      memory: (B, Tm, D); beam_size: K.

    Returns:
      seqs: (B, K, T-1) token ids per beam (best first).
      seq_log_prob: (B, K) accumulated log-probs.
    """
    B, Tm, D = memory.shape
    K = beam_size
    T = model.max_text_len

    # The loop-invariant decode state stays at (B,·) — never tiled: the
    # per-layer cross-attention K/V projections are identical for all K
    # beams of a sample (only the queries differ), so the step routes the
    # beam axis through `attend`'s query-sequence axis (`beam_group=K`)
    # instead of repeating the K/V K-fold. This saves both the K× projection
    # FLOPs/writes AND the K× per-step HBM reads of the (Tm,H,Dh) tensors.
    # The classifier matrix is beam-independent entirely.
    mem_state = model.apply(variables, memory,
                            method=GPV.precompute_text_memory)
    caches = init_cache(model, B * K)

    tok0 = jnp.full((B * K,), cls_id, jnp.int32)
    seq_log_prob = jnp.full((B, K), 0.0, jnp.float32)
    seqs0 = jnp.zeros((B, K, T - 1), jnp.int32)

    def step(carry, t):
        caches, tok, seq_log_prob, seqs = carry
        logits, caches = model.apply(variables, tok, mem_state, mem_valid,
                                     caches, t, beam_group=K,
                                     method=GPV.text_step)  # (B*K, V)
        if vocab_mask is not None:
            logits = logits + vocab_mask
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        logp = logp.reshape(B, K, V)

        top_vals, top_ids = jax.lax.top_k(logp, K)  # (B, K, K)
        scores = seq_log_prob[..., None] + top_vals  # (B, K1, K2)
        # t=0: only beam 0 proposes (reference :281-282)
        beam_ok = (jnp.arange(K) == 0)[None, :, None] | (t > 0)
        scores = jnp.where(beam_ok, scores, NEG_INF)

        flat = scores.reshape(B, K * K)  # k1-major, matching reference order
        best_scores, best_idx = jax.lax.top_k(flat, K)  # (B, K)
        src_beam = best_idx // K  # (B, K) originating beam k1
        kk = best_idx % K
        new_tok = jnp.take_along_axis(
            jnp.take_along_axis(top_ids, src_beam[..., None], axis=1),
            kk[..., None], axis=2)[..., 0]  # (B, K)

        # reorder per-beam state by src_beam
        def reorder(x):  # x: (B*K, ...) -> gather along beam axis
            xk = x.reshape(B, K, *x.shape[1:])
            idx = src_beam.reshape(B, K, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xk, idx, axis=1).reshape(x.shape)

        caches = jax.tree.map(reorder, caches)
        seqs = jnp.take_along_axis(seqs, src_beam[..., None], axis=1)
        seqs = seqs.at[:, :, t].set(new_tok)

        return ((caches, new_tok.reshape(B * K), best_scores, seqs),
                None)

    (caches, tok, seq_log_prob, seqs), _ = jax.lax.scan(
        step, (caches, tok0, seq_log_prob, seqs0), jnp.arange(T - 1))
    return seqs, seq_log_prob
