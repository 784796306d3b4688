"""Parity tests that drive the ACTUAL reference source at /root/reference
(not test-authored replicas) against the flax ports through the production
checkpoint converter (VERDICT.md round-1 item 2b).

The reference's pure-torch modules import fine here; only its *dependencies*
that are absent from this image (torchvision, boto3, hydra, torch._six) are
stubbed — and the stubs carry no math that the driven code paths execute,
except `box_area` (the one-line torchvision formula).  Every tensor produced
on the reference side below comes out of code in /root/reference.

Covered reference source:
  - exp/gpv/models/vilbert.py BertConnectionLayer (:859) — co-attention
  - exp/gpv/models/transformer.py Transformer (:17) — DETR encoder/decoder
  - exp/gpv/models/position_encoding.py PositionEmbeddingSine (:12)
  - exp/gpv/models/gpv.py positionalencoding1d (:18), GPV.decode_text (:449),
    GPV.beam_decode_text (:256) incl. the t=0 beam collapse and (dead)
    seen_stop branch
  - exp/gpv/models/answer_head.py AnswerHead (:8)
"""
import math
import os
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

ATOL = 1e-4


# ---------------------------------------------------------------------------
# import-time stubs for reference deps absent from this image
# ---------------------------------------------------------------------------

def _module(name):
    import importlib.machinery
    m = types.ModuleType(name)
    # real ModuleSpec so importlib.util.find_spec probes (e.g. transformers'
    # torchvision-availability check) see a well-formed module
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def _install_stubs():
    # functional pure-torch torchvision (real resnet50 /
    # IntermediateLayerGetter / roi_align — the e2e composition test
    # drives them; see tests/_torchvision_stub.py)
    import _torchvision_stub
    _torchvision_stub.install()

    _module("boto3")
    botocore = _module("botocore")
    exceptions = _module("botocore.exceptions")

    class ClientError(Exception):
        pass

    exceptions.ClientError = ClientError
    botocore.exceptions = exceptions

    if "torch._six" not in sys.modules:
        six = _module("torch._six")
        six.inf = math.inf

    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        tb = _module("torch.utils.tensorboard")

        class SummaryWriter:
            def __init__(self, *a, **k):
                pass

        tb.SummaryWriter = SummaryWriter

    if "hydra" not in sys.modules:
        hydra = _module("hydra")

        def main(*a, **k):
            def deco(f):
                return f

            return deco

        hydra.main = main

    if REF not in sys.path:
        # APPEND, not insert(0): the reference tree has top-level modules
        # (inference.py, utils/, ...) that collide with this repo's; the
        # parity tests only import reference-unique packages (exp.gpv.*,
        # which pull reference utils.*), so lowest precedence suffices —
        # prepending shadowed the repo's root `inference` module for every
        # test collected after this file (full-suite-order failures).
        sys.path.append(REF)


_install_stubs()


@pytest.fixture(autouse=True, scope="module")
def _cpu_cuda_noop():
    """Reference decode paths call `.cuda(device)` unconditionally
    (gpv.py:449-466 etc.); on this CPU-only torch, make it the identity."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig


def sd_np(module, prefix=""):
    # .copy(): .numpy() on a CPU tensor is a VIEW of torch storage, and
    # in-place mutation (optimizer.step) would silently corrupt converted
    # trees captured earlier (bit us in test_reference_train_parity)
    return {prefix + k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# co-attention: reference BertConnectionLayer vs flax CoAttentionLayer
# ---------------------------------------------------------------------------

def _co_att_cfg(dim=32, heads=4, inter=64):
    return NS(visualization=False, bi_num_attention_heads=heads,
              bi_hidden_size=dim, hidden_size=dim, intermediate_size=inter,
              output_size=dim, attention_probs_dropout_prob=0.0,
              hidden_dropout_prob=0.0, hidden_act="gelu", v_hidden_size=dim,
              v_intermediate_size=inter, v_output_size=dim,
              v_attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
              v_hidden_act="gelu", num_layers=2)


def _convert_connection_layer(sd, tn=""):
    """Same mapping as checkpoint.convert_gpv_torch's co_att block."""
    from gpv_tpu.train.checkpoint import _layernorm, _linear

    tree = {}
    base = []
    bi = ["biattention"]
    for proj in ("query", "key", "value"):
        _linear(tree, bi + [f"{proj}1"], sd, tn + f"biattention.{proj}1")
        _linear(tree, bi + [f"{proj}2"], sd, tn + f"biattention.{proj}2")
    _linear(tree, base + ["dense1"], sd, tn + "biOutput.dense1")
    _layernorm(tree, base + ["attn_norm1"], sd, tn + "biOutput.LayerNorm1")
    _linear(tree, base + ["dense2"], sd, tn + "biOutput.dense2")
    _layernorm(tree, base + ["attn_norm2"], sd, tn + "biOutput.LayerNorm2")
    _linear(tree, base + ["ffn_in1"], sd, tn + "v_intermediate.dense")
    _linear(tree, base + ["ffn_out1"], sd, tn + "v_output.dense")
    _layernorm(tree, base + ["ffn_norm1"], sd, tn + "v_output.LayerNorm")
    _linear(tree, base + ["ffn_in2"], sd, tn + "t_intermediate.dense")
    _linear(tree, base + ["ffn_out2"], sd, tn + "t_output.dense")
    _layernorm(tree, base + ["ffn_norm2"], sd, tn + "t_output.LayerNorm")
    return tree


class TestCoAttentionVsReference:
    def test_connection_layer(self):
        from exp.gpv.models.vilbert import BertConnectionLayer

        from gpv_tpu.nn.coattention import CoAttentionLayer

        torch.manual_seed(0)
        D, B, T1, T2 = 32, 2, 7, 10
        ref = BertConnectionLayer(_co_att_cfg(D)).eval()
        x1 = torch.randn(B, T1, D)  # GPV stream1 = text (lv)
        x2 = torch.randn(B, T2, D)  # GPV stream2 = vision queries (vl)
        with torch.no_grad():
            out1, out2, _ = ref(x1, None, x2, None)

        tree = _convert_connection_layer(sd_np(ref))
        ours = CoAttentionLayer(dim=D, num_heads=4, intermediate=64,
                                dropout=0.0)
        y1, y2 = ours.apply({"params": tree}, jnp.asarray(x1.numpy()),
                            jnp.asarray(x2.numpy()))
        np.testing.assert_allclose(np.asarray(y1), out1.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(y2), out2.numpy(), atol=ATOL)

    def test_three_layer_stack_matches_gpv_wiring(self):
        """Stacked exactly as GPV.forward does (gpv.py:149-154)."""
        from exp.gpv.models.vilbert import BertConnectionLayer

        from gpv_tpu.nn.coattention import CoAttentionLayer

        torch.manual_seed(1)
        D, B, Tl, Tv, L = 32, 2, 5, 8, 3
        layers = [BertConnectionLayer(_co_att_cfg(D)).eval()
                  for _ in range(L)]
        lv = torch.randn(B, Tl, D)
        vl = torch.randn(B, Tv, D)
        rlv, rvl = lv, vl
        with torch.no_grad():
            for layer in layers:
                rlv, rvl, _ = layer(input_tensor1=rlv, attention_mask1=None,
                                    input_tensor2=rvl, attention_mask2=None)

        olv, ovl = jnp.asarray(lv.numpy()), jnp.asarray(vl.numpy())
        ours = CoAttentionLayer(dim=D, num_heads=4, intermediate=64,
                                dropout=0.0)
        for layer in layers:
            tree = _convert_connection_layer(sd_np(layer))
            olv, ovl = ours.apply({"params": tree}, olv, ovl)
        np.testing.assert_allclose(np.asarray(olv), rlv.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ovl), rvl.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# DETR transformer: reference Transformer vs flax DetrTransformer
# ---------------------------------------------------------------------------

def _convert_ref_transformer(sd, enc, dec, dim):
    from gpv_tpu.train.checkpoint import _layernorm, _linear, _mha

    params = {}
    for i in range(enc):
        base = [f"encoder_layer{i}"]
        tn = f"encoder.layers.{i}"
        _mha(params, base + ["self_attn"], sd, f"{tn}.self_attn", dim)
        _linear(params, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(params, base + ["linear2"], sd, f"{tn}.linear2")
        _layernorm(params, base + ["norm1"], sd, f"{tn}.norm1")
        _layernorm(params, base + ["norm2"], sd, f"{tn}.norm2")
    for i in range(dec):
        base = [f"decoder_layer{i}"]
        tn = f"decoder.layers.{i}"
        _mha(params, base + ["self_attn"], sd, f"{tn}.self_attn", dim)
        _mha(params, base + ["cross_attn"], sd, f"{tn}.multihead_attn", dim)
        _linear(params, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(params, base + ["linear2"], sd, f"{tn}.linear2")
        for j in (1, 2, 3):
            _layernorm(params, base + [f"norm{j}"], sd, f"{tn}.norm{j}")
    _layernorm(params, ["decoder_norm"], sd, "decoder.norm")
    if "encoder.norm.weight" in sd:  # pre-norm: final encoder LayerNorm
        _layernorm(params, ["encoder_norm"], sd, "encoder.norm")
    return params


class TestDetrTransformerVsReference:
    def test_full_transformer_pre_norm(self):
        """normalize_before=True branches (reference transformer.py
        forward_pre :162-174/:235-260 + encoder_norm :27) vs pre_norm=True."""
        from exp.gpv.models.transformer import Transformer

        from gpv_tpu.nn.detr_transformer import DetrTransformer

        torch.manual_seed(7)
        D, H, B, Hh, Ww, Q = 32, 4, 2, 3, 5, 6
        ref = Transformer(d_model=D, nhead=H, num_encoder_layers=2,
                          num_decoder_layers=2, dim_feedforward=64,
                          dropout=0.0, normalize_before=True,
                          return_intermediate_dec=True).eval()
        src = torch.randn(B, D, Hh, Ww)
        pos = torch.randn(B, D, Hh, Ww)
        query_embed = torch.randn(Q, D)
        mask = torch.zeros(B, Hh, Ww, dtype=torch.bool)
        mask[1, :, 3:] = True
        with torch.no_grad():
            hs_ref, _ = ref(src, mask, query_embed, pos)

        params = _convert_ref_transformer(sd_np(ref), 2, 2, D)
        ours = DetrTransformer(dim=D, num_heads=H, num_encoder_layers=2,
                               num_decoder_layers=2, ffn_dim=64,
                               dropout=0.0, pre_norm=True)
        flat = lambda x: jnp.asarray(x.flatten(2).permute(0, 2, 1).numpy())
        key_valid = jnp.asarray(~mask.flatten(1).numpy())
        hs, _ = ours.apply({"params": params}, flat(src), flat(pos),
                           jnp.asarray(query_embed.numpy()), key_valid)
        np.testing.assert_allclose(np.asarray(hs), hs_ref.numpy(), atol=ATOL)

    @pytest.mark.parametrize("padded", [False, True])
    def test_full_transformer(self, padded):
        from exp.gpv.models.transformer import Transformer

        from gpv_tpu.nn.detr_transformer import DetrTransformer

        torch.manual_seed(2)
        D, H, B, Hh, Ww, Q = 32, 4, 2, 3, 5, 6
        ref = Transformer(d_model=D, nhead=H, num_encoder_layers=2,
                          num_decoder_layers=2, dim_feedforward=64,
                          dropout=0.0, return_intermediate_dec=True).eval()
        src = torch.randn(B, D, Hh, Ww)
        pos = torch.randn(B, D, Hh, Ww)
        query_embed = torch.randn(Q, D)
        mask = torch.zeros(B, Hh, Ww, dtype=torch.bool)  # True = PAD
        if padded:
            mask[1, :, 3:] = True
        with torch.no_grad():
            hs_ref, mem_ref = ref(src, mask, query_embed, pos)

        params = _convert_ref_transformer(sd_np(ref), 2, 2, D)
        ours = DetrTransformer(dim=D, num_heads=H, num_encoder_layers=2,
                               num_decoder_layers=2, ffn_dim=64, dropout=0.0)
        # flax side takes flattened (B, HW, D) + valid mask
        flat = lambda x: jnp.asarray(
            x.flatten(2).permute(0, 2, 1).numpy())  # (B,HW,D)
        key_valid = jnp.asarray(~mask.flatten(1).numpy())
        hs, mem = ours.apply({"params": params}, flat(src), flat(pos),
                             jnp.asarray(query_embed.numpy()), key_valid)
        np.testing.assert_allclose(np.asarray(hs), hs_ref.numpy(), atol=ATOL)
        # reference returns memory as (B, C, H, W)
        mem_ref_flat = mem_ref.flatten(2).permute(0, 2, 1).numpy()
        if padded:  # padded positions' memory is unused downstream
            mem_ref_flat = mem_ref_flat[np.asarray(key_valid)]
            mem = np.asarray(mem)[np.asarray(key_valid)]
        np.testing.assert_allclose(np.asarray(mem), mem_ref_flat, atol=ATOL)


# ---------------------------------------------------------------------------
# 2-D sine position embedding vs reference PositionEmbeddingSine
# ---------------------------------------------------------------------------

class TestPositionEncodingVsReference:
    def test_sine_2d(self):
        from exp.gpv.models.position_encoding import PositionEmbeddingSine
        from utils.detr_misc import NestedTensor

        from gpv_tpu.ops.posenc import sine_position_embedding_2d

        torch.manual_seed(3)
        B, Hh, Ww, F = 2, 5, 7, 16
        ref = PositionEmbeddingSine(num_pos_feats=F, normalize=True)
        x = torch.randn(B, 3, Hh, Ww)
        mask = torch.zeros(B, Hh, Ww, dtype=torch.bool)
        mask[0, 3:, :] = True
        mask[1, :, 5:] = True
        with torch.no_grad():
            pos_ref = ref(NestedTensor(x, mask))  # (B, 2F, H, W)

        pos = sine_position_embedding_2d(jnp.asarray(~mask.numpy()),
                                         num_pos_feats=F)  # (B,H,W,2F)
        np.testing.assert_allclose(
            np.asarray(pos).transpose(0, 3, 1, 2), pos_ref.numpy(),
            atol=1e-5)

    def test_learned_2d(self):
        """Learned 50x50 row/col embedding (position_encoding.py:51-76) vs
        LearnedPositionEmbedding2D with the reference's own tables."""
        from exp.gpv.models.position_encoding import PositionEmbeddingLearned
        from utils.detr_misc import NestedTensor

        from gpv_tpu.ops.posenc import LearnedPositionEmbedding2D

        torch.manual_seed(11)
        B, Hh, Ww, F = 2, 6, 9, 16
        ref = PositionEmbeddingLearned(num_pos_feats=F)
        x = torch.randn(B, 3, Hh, Ww)
        with torch.no_grad():
            pos_ref = ref(NestedTensor(x, torch.zeros(B, Hh, Ww,
                                                      dtype=torch.bool)))

        params = {"row_embed": jnp.asarray(ref.row_embed.weight.detach()
                                           .numpy()),
                  "col_embed": jnp.asarray(ref.col_embed.weight.detach()
                                           .numpy())}
        pos = LearnedPositionEmbedding2D(num_pos_feats=F).apply(
            {"params": params}, B, Hh, Ww)
        np.testing.assert_allclose(
            np.asarray(pos).transpose(0, 3, 1, 2), pos_ref.numpy(),
            atol=1e-6)

    def test_sine_1d_table(self):
        from exp.gpv.models.gpv import positionalencoding1d

        from gpv_tpu.ops.posenc import sine_position_encoding_1d

        ref = positionalencoding1d(32, 30).numpy()
        ours = np.asarray(sine_position_encoding_1d(32, 30))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# text decode stack: reference GPV.decode_text / beam_decode_text driven
# directly (GPV.__new__ with only the decode attributes), vs flax GPV methods
# + gpv_tpu.decode.{greedy,beam}
# ---------------------------------------------------------------------------

D, HEADS, LAYERS, V, T_MAX, B, TM = 32, 4, 2, 30, 6, 2, 12


def _ref_decode_gpv(vocab_words, vocab_embed, D=D, HEADS=HEADS,
                    LAYERS=LAYERS, T_MAX=T_MAX):
    """Reference GPV with exactly the attributes its decode paths touch."""
    from exp.gpv.models.answer_head import AnswerHead
    from exp.gpv.models.gpv import (GPV as RefGPV, AnswerInputEmbedding,
                                    build_transformer_decoder)

    ref = RefGPV.__new__(RefGPV)
    torch.nn.Module.__init__(ref)
    ref.cfg = NS(text_decoder=NS(pos_enc=False), max_text_len=T_MAX)
    ref.text_decoder = build_transformer_decoder(
        NS(hidden_dim=D, dropout=0.0, nheads=HEADS, num_layers=LAYERS))
    transform = torch.nn.Linear(D, D)
    ref.answer_head = AnswerHead(vocab_words, D, transform, vocab_embed)
    ref.vocab = vocab_words
    ref.word_to_idx = {w: i for i, w in enumerate(vocab_words)}
    ref.answer_input_embedings = AnswerInputEmbedding(
        torch.FloatTensor(vocab_embed), torch.nn.Linear(D, D),
        freeze_embeddings=True)
    ref.vision_token = torch.nn.Parameter(torch.zeros(D))
    return ref.eval()


def _flax_gpv_with_ref_weights(ref, D=D, HEADS=HEADS, LAYERS=LAYERS,
                            V=V, T_MAX=T_MAX):
    """Flax GPV whose text-decode params are REPLACED by the reference
    module's weights through the production converter helpers."""
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.train.checkpoint import _layernorm, _linear, _mha, _set

    detr_cfg = dict(num_queries=10, num_classes=1, hidden_dim=D,
                    nheads=HEADS, num_encoder_layers=1, num_decoder_layers=1,
                    dim_feedforward=64, dropout=0.0)
    model = GPV(vocab_size=V, hidden_dim=D, max_text_len=T_MAX,
                co_att_num_layers=1, co_att_heads=HEADS,
                co_att_intermediate=64, dropout=0.0,
                text_decoder_layers=LAYERS, text_decoder_heads=HEADS,
                detr_cfg=detr_cfg, bert_layers=1, bert_hidden=D,
                bert_heads=HEADS, bert_vocab_size=50)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 48, 64, 3)),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.zeros((1, 4), jnp.int32), train=False)

    sd = {}
    sd.update(sd_np(ref.text_decoder, "text_decoder."))
    sd.update(sd_np(ref.answer_head, "answer_head."))
    sd.update(sd_np(ref.answer_input_embedings, "answer_input_embedings."))
    tree = {}
    for i in range(LAYERS):
        base = ["text_decoder", f"layer{i}"]
        tn = f"text_decoder.layers.{i}"
        _mha(tree, base + ["self_attn"], sd, f"{tn}.self_attn", D)
        _mha(tree, base + ["cross_attn"], sd, f"{tn}.multihead_attn", D)
        _linear(tree, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(tree, base + ["linear2"], sd, f"{tn}.linear2")
        for j in (1, 2, 3):
            _layernorm(tree, base + [f"norm{j}"], sd, f"{tn}.norm{j}")
    _set(tree, ["vocab_embed"], sd["answer_head.vocab_embed"])
    _linear(tree, ["classifier_transform"], sd,
            "answer_head.classifier_transform")
    _linear(tree, ["answer_input_transform"], sd,
            "answer_input_embedings.transform")

    params = dict(variables["params"])
    params.update(tree)
    return model, {**variables, "params": params}


@pytest.fixture(scope="module")
def decode_pair():
    from gpv_tpu.text.vocab import AnswerVocab

    torch.manual_seed(4)
    vocab = AnswerVocab.debug(size=V)
    vocab_embed = 0.1 * np.random.RandomState(4).randn(V, D).astype(
        np.float32)
    ref = _ref_decode_gpv(vocab.words, vocab_embed)
    model, variables = _flax_gpv_with_ref_weights(ref)
    memory = torch.randn(B, TM, D)
    return ref, model, variables, vocab, memory


class TestTextDecodeVsReference:
    def test_teacher_forced_decode_text(self, decode_pair):
        from gpv_tpu.models.gpv import GPV

        ref, model, variables, vocab, memory = decode_pair
        S = 5
        ids = torch.randint(0, V, (B, S))
        with torch.no_grad():
            target = ref.answer_input_embedings(ids).view(1, B, S, D)
            logits_ref = ref.decode_text(target, memory.view(1, B, TM, D))

        target_j = model.apply(variables, jnp.asarray(ids.numpy()),
                               method=GPV.embed_answer_tokens)
        logits = model.apply(variables, target_j,
                             jnp.asarray(memory.numpy()),
                             method=GPV.decode_text)
        np.testing.assert_allclose(np.asarray(logits),
                                   logits_ref[0].numpy(), atol=ATOL)

    def test_greedy_matches_reference_k1_beam(self, decode_pair):
        """Reference beam K=1 == greedy trajectory (argmax per step)."""
        from gpv_tpu.decode.greedy import greedy_decode

        ref, model, variables, vocab, memory = decode_pair
        with torch.no_grad():
            answers, _ = ref.beam_decode_text(memory.view(1, B, TM, D), K=1)

        tokens, _ = greedy_decode(model, variables,
                                  jnp.asarray(memory.numpy()), None,
                                  vocab.cls_id, stop_id=vocab.stop_id)
        got = vocab.decode_ids(np.asarray(tokens))
        for b in range(B):
            # [:T_MAX-1] drops the reference BEAM tail quirk (phantom
            # vocab[0] on no-stop beams, gpv.py:316-327) — greedy decode
            # has no such quirk on either side
            assert got[b].split() == answers[b][0][:T_MAX - 1], (
                f"sample {b}: ours={got[b]!r} ref={answers[b][0]!r}")

    def test_beam_search_matches_reference(self, decode_pair):
        from gpv_tpu.decode.beam import beam_decode

        ref, model, variables, vocab, memory = decode_pair
        K = 3
        with torch.no_grad():
            answers, probs = ref.beam_decode_text(memory.view(1, B, TM, D),
                                                  K=K)

        seqs, logp = beam_decode(model, variables,
                                 jnp.asarray(memory.numpy()), None,
                                 vocab.cls_id, K)
        seqs, logp = np.asarray(seqs), np.asarray(logp)
        for b in range(B):
            for k in range(K):
                # decode with the reference beam tail quirk (phantom
                # vocab[0] when no stop was emitted — see
                # AnswerVocab.decode_beam_ids, the engine's beam path)
                words = []
                stopped = False
                for t in range(seqs.shape[-1]):
                    w = vocab.words[seqs[b, k, t]]
                    if w in ("__stop__", "__pad__"):
                        stopped = True
                        break
                    words.append(w)
                if not stopped:
                    words.append(vocab.words[0])
                assert words == answers[b][k], (
                    f"b={b} k={k}: ours={words} ref={answers[b][k]}")
                np.testing.assert_allclose(
                    math.exp(logp[b, k]), probs[b][k], atol=ATOL)


# ---------------------------------------------------------------------------
# losses: reference GPVCriterion (real SetCriterion + scipy Hungarian) vs
# our masked static-shape criterion
# ---------------------------------------------------------------------------

def _ref_losses_cfg():
    """Mirror of the `losses` node of configs/exp/gpv.yaml:86-117."""
    return {
        "CaptionLoss": NS(name="caption_criterion", pad_idx=None,
                          loss_wts={"loss_caption": 5e-2}),
        "VqaLoss": NS(name="vqa_criterion", pad_idx=None,
                      loss_wts={"loss_vqa": 1.0}),
        "ClsLoss": NS(name="cls_criterion", pad_idx=None,
                      loss_wts={"loss_cls": 1.0}),
        "Localization": NS(
            name="localization_criterion",
            cost_wts=NS(ce=1.0, bbox=5.0, giou=2.0),
            loss_wts={"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0},
            eos_coef=0.1, num_classes=1),
    }


class TestCriterionVsReference:
    @pytest.mark.parametrize("with_aux", [False, True])
    def test_full_multitask_batch(self, with_aux):
        from exp.gpv.models.losses import GPVCriterion

        from gpv_tpu.losses import LossConfig, TASK_IDS
        from gpv_tpu.losses.criterion import gpv_criterion

        torch.manual_seed(6)
        Bn, S, Vv, Q, M = 5, 6, 20, 10, 3
        tasks = ["CocoCaptioning", "CocoVqa", "CocoDetection",
                 "CocoClassification", "CocoDetection"]
        n_boxes = {2: 2, 4: 3}  # sample idx -> GT box count

        answer_logits = torch.randn(1, Bn, S - 1, Vv)
        pred_rel = torch.randn(Bn, Q, 2)
        # valid cxcywh in (0,1) with x2>x1 after conversion
        centers = 0.3 + 0.4 * torch.rand(Bn, Q, 2)
        sizes = 0.05 + 0.2 * torch.rand(Bn, Q, 2)
        pred_boxes = torch.cat([centers, sizes], dim=-1)
        answer_ids = torch.randint(0, Vv, (Bn, S))

        targets = []
        for i, task in enumerate(tasks):
            t = {"task": task, "answer_token_ids": answer_ids[i, 1:]}
            if task != "CocoDetection":
                t["answer"] = "x"
            else:
                m = n_boxes[i]
                c = 0.3 + 0.4 * torch.rand(m, 2)
                s = 0.05 + 0.2 * torch.rand(m, 2)
                t["boxes"] = torch.cat([c, s], dim=-1)
                t["labels"] = torch.zeros(m, dtype=torch.long)
            targets.append(t)

        outputs_ref = {
            "answer_logits": answer_logits,
            "pred_relevance_logits": pred_rel,
            "pred_boxes": pred_boxes,
        }
        if with_aux:
            aux_rel = torch.randn(Bn, Q, 2)
            aux_boxes = torch.cat([0.3 + 0.4 * torch.rand(Bn, Q, 2),
                                   0.05 + 0.2 * torch.rand(Bn, Q, 2)],
                                  dim=-1)
            outputs_ref["aux_outputs"] = [
                {"pred_relevance_logits": aux_rel, "pred_boxes": aux_boxes}]

        criterion = GPVCriterion(_ref_losses_cfg())
        with torch.no_grad():
            total_ref, dict_ref = criterion(outputs_ref, targets)

        # ---- ours: same numbers in the masked static-batch layout ----
        boxes = np.zeros((Bn, M, 4), np.float32)
        box_valid = np.zeros((Bn, M), bool)
        for i, t in enumerate(targets):
            if "boxes" in t:
                m = t["boxes"].shape[0]
                boxes[i, :m] = t["boxes"].numpy()
                box_valid[i, :m] = True
        batch = {
            "answer_ids": jnp.asarray(answer_ids.numpy()),
            "answer_lens": jnp.full((Bn,), S, jnp.int32),
            "task_id": jnp.asarray([TASK_IDS[t] for t in tasks], jnp.int32),
            "has_answer": jnp.asarray(
                [t != "CocoDetection" for t in tasks]),
            "boxes": jnp.asarray(boxes),
            "box_labels": jnp.zeros((Bn, M), jnp.int32),
            "box_valid": jnp.asarray(box_valid),
            "has_boxes": jnp.asarray([t == "CocoDetection" for t in tasks]),
        }
        outputs = {
            "answer_logits": jnp.asarray(answer_logits[0].numpy()),
            "pred_relevance_logits": jnp.asarray(pred_rel.numpy()),
            "pred_boxes": jnp.asarray(pred_boxes.numpy()),
        }
        if with_aux:
            outputs["aux_pred_relevance_logits"] = jnp.asarray(
                aux_rel.numpy())[None]
            outputs["aux_pred_boxes"] = jnp.asarray(aux_boxes.numpy())[None]

        total, losses = gpv_criterion(outputs, batch, LossConfig())

        for name in ("loss_caption", "loss_vqa", "loss_cls"):
            np.testing.assert_allclose(
                float(losses[name]), float(dict_ref[name]), rtol=1e-5,
                atol=ATOL, err_msg=name)
        # reference folds aux losses into the same key (losses.py:131-137)
        for name in ("loss_ce", "loss_bbox", "loss_giou"):
            ours = float(losses[name])
            if with_aux:
                ours += float(losses[f"{name}_0"])
            np.testing.assert_allclose(ours, float(dict_ref[name]),
                                       rtol=1e-5, atol=ATOL, err_msg=name)
        np.testing.assert_allclose(float(total), float(total_ref),
                                   rtol=1e-5, atol=ATOL)

    def test_text_only_batch_total(self):
        """No box-bearing samples: reference returns None box losses and a
        text-only total; ours must produce the same total."""
        from exp.gpv.models.losses import GPVCriterion

        from gpv_tpu.losses import LossConfig, TASK_IDS
        from gpv_tpu.losses.criterion import gpv_criterion

        torch.manual_seed(7)
        Bn, S, Vv, Q, M = 2, 5, 15, 8, 2
        tasks = ["CocoVqa", "CocoCaptioning"]
        answer_logits = torch.randn(1, Bn, S - 1, Vv)
        pred_rel = torch.randn(Bn, Q, 2)
        pred_boxes = torch.cat([0.3 + 0.4 * torch.rand(Bn, Q, 2),
                                0.05 + 0.2 * torch.rand(Bn, Q, 2)], dim=-1)
        answer_ids = torch.randint(0, Vv, (Bn, S))
        targets = [{"task": t, "answer": "x",
                    "answer_token_ids": answer_ids[i, 1:]}
                   for i, t in enumerate(tasks)]
        criterion = GPVCriterion(_ref_losses_cfg())
        with torch.no_grad():
            total_ref, dict_ref = criterion(
                {"answer_logits": answer_logits,
                 "pred_relevance_logits": pred_rel,
                 "pred_boxes": pred_boxes}, targets)
        assert dict_ref["loss_ce"] is None

        batch = {
            "answer_ids": jnp.asarray(answer_ids.numpy()),
            "answer_lens": jnp.full((Bn,), S, jnp.int32),
            "task_id": jnp.asarray([TASK_IDS[t] for t in tasks], jnp.int32),
            "has_answer": jnp.ones((Bn,), bool),
            "boxes": jnp.full((Bn, M, 4), 0.4, jnp.float32),
            "box_labels": jnp.zeros((Bn, M), jnp.int32),
            "box_valid": jnp.zeros((Bn, M), bool),
            "has_boxes": jnp.zeros((Bn,), bool),
        }
        total, losses = gpv_criterion(
            {"answer_logits": jnp.asarray(answer_logits[0].numpy()),
             "pred_relevance_logits": jnp.asarray(pred_rel.numpy()),
             "pred_boxes": jnp.asarray(pred_boxes.numpy())},
            batch, LossConfig())
        np.testing.assert_allclose(float(total), float(total_ref),
                                   rtol=1e-5, atol=ATOL)


# ---------------------------------------------------------------------------
# evaluators: reference CocoVqa / CocoClassification driven directly
# (the third_party submodules they don't need here are stubbed empty)
# ---------------------------------------------------------------------------

def _install_eval_stubs():
    for name in ("third_party", "third_party.pycocoevalcap",
                 "third_party.pycocoevalcap.eval",
                 "third_party.detection_metrics",
                 "third_party.detection_metrics.lib",
                 "third_party.detection_metrics.lib.Evaluator"):
        _module(name)


class TestEvaluatorsVsReference:
    def _vqa_fixtures(self):
        rng = np.random.RandomState(11)
        samples, predictions = [], {}
        answers = ["two", "three", "red", "yes"]
        for i in range(40):
            gt = answers[i % 4]
            freq = int(rng.randint(1, 11))
            unseen = ["dog"] if i % 5 == 0 else []
            samples.append({
                "question_id": 1000 + i,
                "all_answers": {gt: freq, "other": 10 - freq},
                "anno": {"answer_type": ["other", "number"][i % 2],
                         "question_type": ["what", "how many"][i % 3 == 0]},
                "coco_categories": {"seen": [], "unseen": unseen},
            })
            if i % 7 != 6:  # some predictions absent
                pred = gt if rng.rand() < 0.6 else "wrong"
                if rng.rand() < 0.3:
                    pred = pred.upper()  # case-insensitivity path
                predictions[str(1000 + i)] = {"answer": pred}
        return samples, predictions

    @pytest.mark.parametrize("novelty", ["everything", "seen_concepts",
                                         "held_out_concepts"])
    def test_vqa_soft_accuracy(self, novelty):
        _install_eval_stubs()
        from exp.gpv import evaluators as ref_eval

        from gpv_tpu.evaluation import evaluators as our_eval

        samples, predictions = self._vqa_fixtures()
        ref = ref_eval.CocoVqa(samples, predictions, None).evaluate(novelty)
        got = our_eval.CocoVqa(samples, predictions).evaluate(novelty)
        assert got["absent"] == ref["absent"]
        assert got["accuracy"]["all"] == ref["accuracy"]["all"]
        assert dict(got["accuracy"]["answer_type"]) == dict(
            ref["accuracy"]["answer_type"])
        assert dict(got["accuracy"]["question_type"]) == dict(
            ref["accuracy"]["question_type"])

    def test_classification_synonym_credit(self):
        _install_eval_stubs()
        from exp.gpv import evaluators as ref_eval

        from gpv_tpu.evaluation import evaluators as our_eval

        rng = np.random.RandomState(12)
        classes = ["dog", "person", "tv", "couch", "sports ball"]
        samples, predictions = [], {}
        # the reference scores against its curated SYNONYMS table; use it
        # to build predictions that exercise the synonym-credit path
        from data.coco.synonyms import SYNONYMS
        for i in range(30):
            cls = classes[i % len(classes)]
            samples.append({
                "id": 2000 + i, "answer": cls,
                "coco_categories": {"seen": [cls], "unseen": []},
            })
            syns = SYNONYMS[cls]
            if i % 6 == 5:
                continue  # absent
            if i % 3 == 0:
                pred = syns[rng.randint(len(syns))]  # synonym credit
            elif i % 3 == 1:
                pred = cls
            else:
                pred = "zebra"  # wrong
            predictions[str(2000 + i)] = {"answer": pred}

        ref = ref_eval.CocoClassification(samples, predictions,
                                          None).evaluate()
        got = our_eval.CocoClassification(samples, predictions).evaluate()
        assert got["absent"] == ref["absent"]
        assert got["overall_correct"] == ref["overall_correct"]
        assert got["overall_total"] == ref["overall_total"]
        assert got["overall_accuracy"] == ref["overall_accuracy"]
        assert dict(got["accuracy"]) == dict(ref["accuracy"])


# ---------------------------------------------------------------------------
# vocab mask + box geometry driven from reference source
# ---------------------------------------------------------------------------

class TestVocabMaskVsReference:
    def test_create_coco_vocab_mask(self):
        _install_eval_stubs()
        _module("imagesize")  # imported by metrics.py, unused by the mask fn
        from exp.gpv import metrics as ref_metrics
        # nltk's word_tokenize needs the punkt data (absent, zero egress);
        # for single phrases it equals the pure TreebankWordTokenizer, which
        # needs no data files — still genuine nltk tokenization
        from nltk.tokenize.treebank import TreebankWordTokenizer
        ref_metrics.word_tokenize = TreebankWordTokenizer().tokenize
        create_coco_vocab_mask = ref_metrics.create_coco_vocab_mask

        from gpv_tpu.infer.predictions import coco_vocab_mask
        from gpv_tpu.text.vocab import AnswerVocab

        # vocab mixing synonym tokens, multiword-synonym pieces, and noise
        words = ["dog", "puppy", "pup", "ball", "sports", "zebra", "the",
                 "remote", "control", "tv", "television", "xyzzy"]
        vocab = AnswerVocab.debug(extra_words=words)
        ref_model = NS(vocab=vocab.words,
                       word_to_idx=vocab.word_to_idx)
        for use_syns in (False, True):
            _, ref_mask = create_coco_vocab_mask(ref_model,
                                                 use_syns=use_syns)
            got = coco_vocab_mask(vocab, use_syns=use_syns)
            np.testing.assert_array_equal(got, ref_mask), use_syns


class TestBoxOpsVsReference:
    def test_giou_and_iou(self):
        import utils.box_ops as ref_box_ops

        from gpv_tpu.ops.boxes import (box_cxcywh_to_xyxy, box_iou,
                                       generalized_box_iou)

        torch.manual_seed(13)
        a_c = torch.cat([0.3 + 0.4 * torch.rand(7, 2),
                         0.05 + 0.3 * torch.rand(7, 2)], dim=-1)
        b_c = torch.cat([0.3 + 0.4 * torch.rand(5, 2),
                         0.05 + 0.3 * torch.rand(5, 2)], dim=-1)
        a = ref_box_ops.box_cxcywh_to_xyxy(a_c)
        b = ref_box_ops.box_cxcywh_to_xyxy(b_c)
        with torch.no_grad():
            giou_ref = ref_box_ops.generalized_box_iou(a, b)
            iou_ref, _ = ref_box_ops.box_iou(a, b)

        aj = box_cxcywh_to_xyxy(jnp.asarray(a_c.numpy()))
        bj = box_cxcywh_to_xyxy(jnp.asarray(b_c.numpy()))
        np.testing.assert_allclose(np.asarray(aj), a.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(generalized_box_iou(aj, bj)),
                                   giou_ref.numpy(), atol=1e-5)
        iou_ours, _ = box_iou(aj, bj)
        np.testing.assert_allclose(np.asarray(iou_ours),
                                   iou_ref.numpy(), atol=1e-5)
