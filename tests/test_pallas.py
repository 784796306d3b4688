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


class TestFusedBiAttention:
    def test_parity_with_validity(self):
        from gpv_tpu.ops.attention import fused_biattention
        rng = np.random.RandomState(3)
        B, T1, T2, H, Dh = 2, 6, 9, 4, 16
        mk = lambda T: jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        q1, k1, v1 = mk(T1), mk(T1), mk(T1)
        q2, k2, v2 = mk(T2), mk(T2), mk(T2)
        valid1 = jnp.asarray(np.stack([[True] * 4 + [False] * 2,
                                       [True] * 6]))
        valid2 = jnp.asarray(rng.rand(B, T2) > 0.2)

        def ref(q, k, v, valid):
            s = jnp.einsum("bqhd,bkhd->bhqk", q * (1.0 / Dh ** 0.5), k)
            s = jnp.where(valid[:, None, None, :], s, -1e9)
            return jnp.einsum("bhqk,bkhd->bqhd",
                              jax.nn.softmax(s, axis=-1), v)

        c1, c2 = fused_biattention(q1, k1, v1, q2, k2, v2, valid1, valid2,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(c1),
                                   np.asarray(ref(q2, k1, v1, valid1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c2),
                                   np.asarray(ref(q1, k2, v2, valid2)),
                                   atol=1e-5)

        # maskless + one-sided variants (review r5: no zero masks are
        # streamed when a stream has no validity — each combo is its own
        # kernel signature, so each needs its own parity pin)
        full1 = jnp.ones((B, T1), bool)
        full2 = jnp.ones((B, T2), bool)
        for va, vb in ((None, None), (valid1, None), (None, valid2)):
            c1, c2 = fused_biattention(q1, k1, v1, q2, k2, v2, va, vb,
                                       interpret=True)
            ea = va if va is not None else full1
            eb = vb if vb is not None else full2
            np.testing.assert_allclose(np.asarray(c1),
                                       np.asarray(ref(q2, k1, v1, ea)),
                                       atol=1e-5, err_msg=f"{va is None}")
            np.testing.assert_allclose(np.asarray(c2),
                                       np.asarray(ref(q1, k2, v2, eb)),
                                       atol=1e-5, err_msg=f"{vb is None}")

    def test_mha_pallas_flag_keeps_training_differentiable(self,
                                                           monkeypatch):
        """Same invariant for MultiHeadAttention (review r5 second pass:
        the DETR/text-decoder attention had the identical dropout==0 hole
        BiAttention was fixed for)."""
        from gpv_tpu.nn.layers import MultiHeadAttention
        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.randn(2, 6, 32).astype(np.float32))
        m = MultiHeadAttention(32, 4, dropout=0.0)
        monkeypatch.setenv("GPV_TPU_PALLAS", "0")
        variables = m.init(jax.random.PRNGKey(0), x, x, x)
        monkeypatch.setenv("GPV_TPU_PALLAS", "1")

        def loss(params):
            out = m.apply({"params": params}, x, x, x,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(variables["params"])
        assert all(bool(jnp.all(jnp.isfinite(g)))
                   for g in jax.tree.leaves(grads))

    def test_pallas_flag_keeps_training_differentiable(self, monkeypatch):
        """GPV_TPU_PALLAS=1 must not route the TRAINING forward
        (deterministic=False, any dropout incl. 0) through pallas_call,
        which has no VJP — jax.grad through BiAttention must work with
        the flag set (review r5)."""
        from gpv_tpu.nn.coattention import BiAttention
        rng = np.random.RandomState(7)
        x1 = jnp.asarray(rng.randn(2, 4, 32).astype(np.float32))
        x2 = jnp.asarray(rng.randn(2, 6, 32).astype(np.float32))
        m = BiAttention(dim=32, num_heads=4, dropout=0.0)
        monkeypatch.setenv("GPV_TPU_PALLAS", "0")  # init is deterministic
        variables = m.init(jax.random.PRNGKey(0), x1, x2)
        monkeypatch.setenv("GPV_TPU_PALLAS", "1")

        def loss(params):
            c1, c2 = m.apply({"params": params}, x1, x2,
                             deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(c1 ** 2) + jnp.sum(c2 ** 2)

        grads = jax.grad(loss)(variables["params"])
        assert all(bool(jnp.all(jnp.isfinite(g)))
                   for g in jax.tree.leaves(grads))

    def test_biattention_module_pallas_path(self, monkeypatch):
        """BiAttention with GPV_TPU_PALLAS=1 == einsum path."""
        monkeypatch.setenv("GPV_TPU_PALLAS", "0")
        from gpv_tpu.nn.coattention import BiAttention
        rng = np.random.RandomState(4)
        x1 = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32))
        x2 = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
        valid1 = jnp.asarray(rng.rand(2, 5) > 0.2)
        valid2 = jnp.asarray(rng.rand(2, 7) > 0.2)
        m = BiAttention(dim=32, num_heads=4, dropout=0.1)
        variables = m.init(jax.random.PRNGKey(0), x1, x2)
        ref1, ref2 = m.apply(variables, x1, x2, valid1, valid2,
                             deterministic=True)
        monkeypatch.setenv("GPV_TPU_PALLAS", "1")
        import gpv_tpu.ops.attention as A
        real = A.fused_biattention
        monkeypatch.setattr(
            A, "fused_biattention",
            lambda *a, **kw: real(*a, interpret=True, **kw))
        got1, got2 = m.apply(variables, x1, x2, valid1, valid2,
                             deterministic=True)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=1e-5)
