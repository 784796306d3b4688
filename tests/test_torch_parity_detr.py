"""Parity of the DETR transformer layers and ViLBERT co-attention vs torch
replicas built from the published architecture (post-norm layers with pos
embeddings injected at Q/K, bi-attention weight routing). These pin down the
riskiest converter links beyond the basic-module tests."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpv_tpu.nn.coattention import CoAttentionLayer
from gpv_tpu.nn.detr_transformer import DecoderLayer, EncoderLayer
from gpv_tpu.train.checkpoint import _linear, _mha, _set

D, H, FFN = 32, 4, 64


class TorchDetrEncoderLayer(tnn.Module):
    """Post-norm DETR encoder layer: pos added to q/k only."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, H, batch_first=True)
        self.linear1 = tnn.Linear(D, FFN)
        self.linear2 = tnn.Linear(FFN, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)

    def forward(self, src, pos):
        q = k = src + pos
        a, _ = self.self_attn(q, k, src)
        src = self.norm1(src + a)
        f = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + f)


class TorchDetrDecoderLayer(tnn.Module):
    """Post-norm DETR decoder layer: query_pos on tgt q/k, pos on memory k."""

    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(D, H, batch_first=True)
        self.multihead_attn = tnn.MultiheadAttention(D, H, batch_first=True)
        self.linear1 = tnn.Linear(D, FFN)
        self.linear2 = tnn.Linear(FFN, D)
        self.norm1 = tnn.LayerNorm(D)
        self.norm2 = tnn.LayerNorm(D)
        self.norm3 = tnn.LayerNorm(D)

    def forward(self, tgt, memory, query_pos, pos):
        q = k = tgt + query_pos
        a, _ = self.self_attn(q, k, tgt)
        tgt = self.norm1(tgt + a)
        a, _ = self.multihead_attn(tgt + query_pos, memory + pos, memory)
        tgt = self.norm2(tgt + a)
        f = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + f)


def convert_common(sd, base, tree):
    _linear(tree, base + ["linear1"], sd, "linear1")
    _linear(tree, base + ["linear2"], sd, "linear2")
    for i in (1, 2, 3):
        if f"norm{i}.weight" in sd:
            _set(tree, base + [f"norm{i}", "scale"], sd[f"norm{i}.weight"])
            _set(tree, base + [f"norm{i}", "bias"], sd[f"norm{i}.bias"])


class TestDetrLayerParity:
    def test_encoder_layer(self):
        torch.manual_seed(0)
        tl = TorchDetrEncoderLayer().eval()
        B, T = 2, 12
        src = torch.randn(B, T, D)
        pos = torch.randn(B, T, D)
        with torch.no_grad():
            ref = tl(src, pos)
        sd = {k: v.numpy() for k, v in tl.state_dict().items()}
        tree: dict = {}
        _mha(tree, ["self_attn"], sd, "self_attn", D)
        convert_common(sd, [], tree)
        layer = EncoderLayer(D, H, FFN, dropout=0.0)
        out = layer.apply({"params": tree}, jnp.asarray(src.numpy()),
                          jnp.asarray(pos.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)

    def test_decoder_layer(self):
        torch.manual_seed(1)
        tl = TorchDetrDecoderLayer().eval()
        B, Q, T = 2, 6, 12
        tgt = torch.randn(B, Q, D)
        mem = torch.randn(B, T, D)
        qp = torch.randn(B, Q, D)
        pos = torch.randn(B, T, D)
        with torch.no_grad():
            ref = tl(tgt, mem, qp, pos)
        sd = {k: v.numpy() for k, v in tl.state_dict().items()}
        tree: dict = {}
        _mha(tree, ["self_attn"], sd, "self_attn", D)
        _mha(tree, ["cross_attn"], sd, "multihead_attn", D)
        convert_common(sd, [], tree)
        layer = DecoderLayer(D, H, FFN, dropout=0.0)
        out = layer.apply({"params": tree}, jnp.asarray(tgt.numpy()),
                          jnp.asarray(mem.numpy()), jnp.asarray(qp.numpy()),
                          jnp.asarray(pos.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


class TorchBiAttentionBlock(tnn.Module):
    """ViLBERT BertConnectionLayer replica (vilbert.py:696-905 semantics):
    stream1 q/k/v ('1' weights), stream2 q/k/v ('2'); ctx1 = softmax(q2 k1)v1;
    biOutput: h1 = LN1(dense1(ctx2) + x1), h2 = LN2(dense2(ctx1) + x2);
    per-stream GELU FFNs."""

    def __init__(self):
        super().__init__()
        for s in ("1", "2"):
            for p in ("query", "key", "value"):
                setattr(self, f"{p}{s}", tnn.Linear(D, D))
        self.dense1 = tnn.Linear(D, D)
        self.norm1 = tnn.LayerNorm(D, eps=1e-12)
        self.dense2 = tnn.Linear(D, D)
        self.norm2 = tnn.LayerNorm(D, eps=1e-12)
        self.ffn_in1 = tnn.Linear(D, FFN)
        self.ffn_out1 = tnn.Linear(FFN, D)
        self.ffn_norm1 = tnn.LayerNorm(D, eps=1e-12)
        self.ffn_in2 = tnn.Linear(D, FFN)
        self.ffn_out2 = tnn.Linear(FFN, D)
        self.ffn_norm2 = tnn.LayerNorm(D, eps=1e-12)

    def _heads(self, x):
        B, T, _ = x.shape
        return x.view(B, T, H, D // H).permute(0, 2, 1, 3)

    def forward(self, x1, x2):
        q1, k1, v1 = (self._heads(f(x1)) for f in
                      (self.query1, self.key1, self.value1))
        q2, k2, v2 = (self._heads(f(x2)) for f in
                      (self.query2, self.key2, self.value2))
        dh = D // H
        a1 = torch.softmax(q2 @ k1.transpose(-1, -2) / dh ** 0.5, -1)
        ctx1 = (a1 @ v1).permute(0, 2, 1, 3).reshape(x2.shape)
        a2 = torch.softmax(q1 @ k2.transpose(-1, -2) / dh ** 0.5, -1)
        ctx2 = (a2 @ v2).permute(0, 2, 1, 3).reshape(x1.shape)
        h1 = self.norm1(self.dense1(ctx2) + x1)
        h2 = self.norm2(self.dense2(ctx1) + x2)
        o1 = self.ffn_norm1(self.ffn_out1(F.gelu(self.ffn_in1(h1))) + h1)
        o2 = self.ffn_norm2(self.ffn_out2(F.gelu(self.ffn_in2(h2))) + h2)
        return o1, o2


class TestCoAttentionParity:
    def test_connection_layer(self):
        torch.manual_seed(2)
        tl = TorchBiAttentionBlock().eval()
        B, T1, T2 = 2, 7, 11
        x1 = torch.randn(B, T1, D)
        x2 = torch.randn(B, T2, D)
        with torch.no_grad():
            r1, r2 = tl(x1, x2)
        sd = {k: v.numpy() for k, v in tl.state_dict().items()}
        tree: dict = {}
        for p in ("query", "key", "value"):
            _linear(tree, ["biattention", f"{p}1"], sd, f"{p}1")
            _linear(tree, ["biattention", f"{p}2"], sd, f"{p}2")
        _linear(tree, ["dense1"], sd, "dense1")
        _set(tree, ["attn_norm1", "scale"], sd["norm1.weight"])
        _set(tree, ["attn_norm1", "bias"], sd["norm1.bias"])
        _linear(tree, ["dense2"], sd, "dense2")
        _set(tree, ["attn_norm2", "scale"], sd["norm2.weight"])
        _set(tree, ["attn_norm2", "bias"], sd["norm2.bias"])
        for tag in ("1", "2"):
            _linear(tree, [f"ffn_in{tag}"], sd, f"ffn_in{tag}")
            _linear(tree, [f"ffn_out{tag}"], sd, f"ffn_out{tag}")
            _set(tree, [f"ffn_norm{tag}", "scale"],
                 sd[f"ffn_norm{tag}.weight"])
            _set(tree, [f"ffn_norm{tag}", "bias"], sd[f"ffn_norm{tag}.bias"])
        layer = CoAttentionLayer(D, H, FFN, dropout=0.0)
        o1, o2 = layer.apply({"params": tree}, jnp.asarray(x1.numpy()),
                             jnp.asarray(x2.numpy()))
        np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(o2), r2.numpy(), atol=2e-5)
