"""Pallas fused-attention parity tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.ops.attention import attention_mask, fused_attention


def reference_attention(q, k, v, mask=None):
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (1.0 / dh ** 0.5), k)
    if mask is not None:
        logits = logits + mask[:, None]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


class TestFusedAttention:
    def test_parity_no_mask(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 16, 4, 32).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 24, 4, 32).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 24, 4, 32).astype(np.float32))
        got = fused_attention(q, k, v, interpret=True)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_parity_with_padding_and_causal(self):
        rng = np.random.RandomState(1)
        B, T, H, Dh = 2, 8, 2, 16
        q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        k, v = q, q
        causal = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e9)
        key_valid = jnp.asarray(
            np.stack([[True] * 6 + [False] * 2, [True] * 8]))
        mask = attention_mask(key_valid, causal, B, T, T)
        got = fused_attention(q, k, v, mask, interpret=True)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_mha_module_pallas_path(self, monkeypatch):
        """MultiHeadAttention with GPV_TPU_PALLAS=1 == einsum path."""
        monkeypatch.setenv("GPV_TPU_PALLAS", "0")
        from gpv_tpu.nn.layers import MultiHeadAttention
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
        m = MultiHeadAttention(32, 4, dropout=0.0)
        variables = m.init(jax.random.PRNGKey(0), x, x, x)
        ref = m.apply(variables, x, x, x)
        monkeypatch.setenv("GPV_TPU_PALLAS", "1")
        import gpv_tpu.ops.attention as A
        monkeypatch.setattr(
            A, "fused_attention",
            lambda q, k, v, mask=None: fused_attention(q, k, v, mask,
                                                       interpret=True))
        got = m.apply(variables, x, x, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
