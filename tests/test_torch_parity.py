"""Numerical parity of flax modules vs torch references through the
checkpoint converter (SURVEY.md §7 hard-part #1: MHA packing, FrozenBN,
BERT layout). torch (CPU) is only a test dependency."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gpv_tpu.nn.layers import FrozenBatchNorm, MultiHeadAttention
from gpv_tpu.nn.text_decoder import TextDecoder
from gpv_tpu.train.checkpoint import (_linear, _mha, _set, convert_bert_torch)

ATOL = 2e-5


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestMHAParity:
    def test_vs_torch_multihead(self):
        torch.manual_seed(0)
        D, H, B, T = 32, 4, 2, 7
        tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
        tmha.eval()
        x = torch.randn(B, T, D)
        with torch.no_grad():
            ref, _ = tmha(x, x, x)

        sd = {f"attn.{k}": v for k, v in sd_numpy(tmha).items()}
        tree = {}
        _mha(tree, ["m"], sd, "attn", D)
        model = MultiHeadAttention(D, H)
        variables = {"params": tree["m"]}
        out = model.apply(variables, jnp.asarray(x.numpy()),
                          jnp.asarray(x.numpy()), jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=ATOL)

    def test_key_padding_mask(self):
        torch.manual_seed(1)
        D, H, B, T = 32, 4, 2, 6
        tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
        tmha.eval()
        x = torch.randn(B, T, D)
        pad = torch.zeros(B, T, dtype=torch.bool)
        pad[:, 4:] = True  # torch: True = IGNORE
        with torch.no_grad():
            ref, _ = tmha(x, x, x, key_padding_mask=pad)
        sd = {f"attn.{k}": v for k, v in sd_numpy(tmha).items()}
        tree = {}
        _mha(tree, ["m"], sd, "attn", D)
        model = MultiHeadAttention(D, H)
        out = model.apply({"params": tree["m"]}, jnp.asarray(x.numpy()),
                          jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
                          key_valid=jnp.asarray(~pad.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=ATOL)


class TestTextDecoderParity:
    def test_vs_torch_transformer_decoder(self):
        """Reference text decoder: nn.TransformerDecoder(3x d=32 post-norm
        relu) with causal mask (gpv.py:37-43,449-466)."""
        torch.manual_seed(2)
        D, H, L, B, S, Tm = 32, 4, 3, 2, 5, 9
        layer = torch.nn.TransformerDecoderLayer(
            d_model=D, nhead=H, dim_feedforward=2048, dropout=0.0)
        tdec = torch.nn.TransformerDecoder(layer, L)
        tdec.eval()
        tgt = torch.randn(S, B, D)
        mem = torch.randn(Tm, B, D)
        mask = torch.zeros(S, S)
        for i in range(S):
            mask[i, i + 1:] = float("-inf")
        with torch.no_grad():
            ref = tdec(tgt, mem, mask.bool())

        sd = sd_numpy(tdec)
        tree = {}
        for i in range(L):
            base = [f"layer{i}"]
            tn = f"layers.{i}"
            _mha(tree, base + ["self_attn"], sd, f"{tn}.self_attn", D)
            _mha(tree, base + ["cross_attn"], sd, f"{tn}.multihead_attn", D)
            _linear(tree, base + ["linear1"], sd, f"{tn}.linear1")
            _linear(tree, base + ["linear2"], sd, f"{tn}.linear2")
            for j in (1, 2, 3):
                _set(tree, base + [f"norm{j}", "scale"],
                     sd[f"{tn}.norm{j}.weight"])
                _set(tree, base + [f"norm{j}", "bias"],
                     sd[f"{tn}.norm{j}.bias"])
        model = TextDecoder(dim=D, num_heads=H, num_layers=L, ffn_dim=2048,
                            dropout=0.0)
        out = model.apply({"params": tree},
                          jnp.asarray(tgt.permute(1, 0, 2).numpy()),
                          jnp.asarray(mem.permute(1, 0, 2).numpy()))
        np.testing.assert_allclose(np.asarray(out),
                                   ref.permute(1, 0, 2).numpy(), atol=1e-4)


class TestBertParity:
    def test_vs_hf_bert_random_init(self):
        transformers = pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel
        cfg = BertConfig(vocab_size=50, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=16,
                         hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
        tmodel = BertModel(cfg)
        tmodel.eval()
        ids = torch.randint(0, 50, (2, 7))
        attn = torch.ones(2, 7, dtype=torch.long)
        with torch.no_grad():
            ref = tmodel(input_ids=ids, attention_mask=attn)[0]

        sd = {f"bert.model.{k}": v for k, v in sd_numpy(tmodel).items()}
        from gpv_tpu.nn.bert import BertEncoder
        params = convert_bert_torch(sd, num_layers=2, dim=32)
        model = BertEncoder(num_layers=2, hidden=32, heads=4,
                            intermediate=64, vocab_size=50, max_len=16,
                            dropout=0.0)
        out = model.apply({"params": params}, jnp.asarray(ids.numpy()),
                          valid=jnp.ones((2, 7), bool))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


class TestConvBnParity:
    def test_conv_frozen_bn(self):
        torch.manual_seed(3)
        conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        bn = torch.nn.BatchNorm2d(8)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
        conv.eval()
        bn.eval()
        x = torch.randn(2, 3, 10, 12)
        with torch.no_grad():
            ref = bn(conv(x))

        import flax.linen as nn

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            name="conv")(x)
                return FrozenBatchNorm(8, name="bn")(x)

        params = {"conv": {"kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0))}}
        stats = {"bn": {
            "weight": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
            "running_mean": jnp.asarray(bn.running_mean.numpy()),
            "running_var": jnp.asarray(bn.running_var.numpy()),
        }}
        out = Block().apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)
