"""END-TO-END composition parity vs the ACTUAL reference `GPV` at RELEASED
dims (VERDICT r3 missing #1/#2, next-round #1): every prior parity test
drives reference modules in isolation; this one executes
`/root/reference/exp/gpv/models/gpv.py` `GPV.forward` (:137) and
`forward_beam_search` (:209) — the full composition ResNet-50(3,4,6,3) ->
DETR+RoI (`detr_roi_head.py:44-92`) -> joiners -> BERT -> 3x co-attention ->
relevance add -> conditioning -> decode — against the flax port through the
PRODUCTION converter (`gpv_tpu.train.checkpoint.convert_gpv_torch`), at
480x640 with a second natively-smaller (440x576) padded sample.

torchvision (absent from this image) is replaced by the functional
pure-torch stub in tests/_torchvision_stub.py (real resnet50 /
IntermediateLayerGetter / roi_align); `Bert` (which downloads
bert-base-uncased — no egress) by a random-init HF `BertModel` at the
released architecture plus a deterministic tokenizer. Both sides share
one set of random weights routed through the converter, and FrozenBN
buffers are randomized so BN math is actually exercised (at init FrozenBN
is the identity). All fp32, eval mode, batched reference semantics
(`mask_query_pads=False`, PARITY.md #12).
"""
import hashlib
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import _torchvision_stub  # noqa: E402
# installs the dependency stubs + appends /root/reference to sys.path
from test_reference_source import sd_np  # noqa: E402,F401

REF = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not mounted")]

FV = 10_000  # released vocab size ballpark (vocab.json is ~10.4k words)


@pytest.fixture(autouse=True, scope="module")
def _cpu_cuda_noop():
    """Reference decode paths call `.cuda(device)` unconditionally
    (gpv.py:180,259-263 etc.); on this CPU-only torch, make it identity."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig


def max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


# ---------------------------------------------------------------------------
# Bert stand-in: released architecture, random weights, offline tokenizer
# ---------------------------------------------------------------------------

class _StubTokenizer:
    """Deterministic word-hash tokenizer with the HF call contract the
    reference uses (bert.py:12-16): [CLS] w1..wn [SEP], 0-padded, plus
    token_type_ids / attention_mask."""

    def __call__(self, sentences, padding=True, return_tensors="pt"):
        assert padding and return_tensors == "pt"
        seqs = []
        for s in sentences:
            ids = [1000 + int(hashlib.md5(w.encode()).hexdigest(), 16) % 29000
                   for w in s.lower().split()]
            seqs.append([101] + ids + [102])
        S = max(len(s) for s in seqs)
        input_ids = torch.zeros(len(seqs), S, dtype=torch.long)
        mask = torch.zeros(len(seqs), S, dtype=torch.long)
        for i, s in enumerate(seqs):
            input_ids[i, :len(s)] = torch.tensor(s)
            mask[i, :len(s)] = 1
        return {"input_ids": input_ids,
                "token_type_ids": torch.zeros_like(input_ids),
                "attention_mask": mask}


class _StubBert(torch.nn.Module):
    """Drop-in for exp/gpv/models/bert.py `Bert` with the same forward
    contract (returns (last_hidden_state, token_inputs)) but a random-init
    `BertModel` at bert-base dims instead of the downloaded checkpoint."""

    def __init__(self, cfg=None):
        super().__init__()
        from transformers import BertConfig, BertModel
        self.tokenizer = _StubTokenizer()
        self.model = BertModel(BertConfig())  # bert-base released dims

    def forward(self, sentences, device=None):
        token_inputs = self.tokenizer(sentences, padding=True,
                                      return_tensors="pt")
        outputs = self.model(**token_inputs)
        return outputs[0], token_inputs


# ---------------------------------------------------------------------------
# released model config (configs/exp/gpv.yaml:27-85, interpolations resolved)
# ---------------------------------------------------------------------------

def _released_cfg(vocab_path, embed_path):
    from types import SimpleNamespace as NS
    from test_reference_source import _ref_losses_cfg
    detr = NS(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
              num_encoder_layers=6, num_decoder_layers=6, backbone="resnet50",
              lr_backbone=1e-5, position_embedding="sine", masks=False,
              dilation=False, dropout=0.1, dim_feedforward=2048,
              pre_norm=False, aux_loss=False, frozenbatchnorm=True,
              last_layer_only=True)
    co_att = NS(visualization=False, bi_num_attention_heads=16,
                bi_hidden_size=768, hidden_size=768, intermediate_size=3072,
                output_size=768, attention_probs_dropout_prob=0.1,
                hidden_dropout_prob=0.1, hidden_act="gelu",
                v_hidden_size=768, v_intermediate_size=3072,
                v_output_size=768, v_attention_probs_dropout_prob=0.1,
                v_hidden_dropout_prob=0.1, v_hidden_act="gelu", num_layers=3)
    return NS(vocab=str(vocab_path), vocab_embed=str(embed_path),
              max_pos_enc_len=30, max_text_len=20, answer_head=None,
              answering_type="generation", hidden_dim=768, roi_head=True,
              relevance_conditioning=True, detr=detr,
              detr_joiner=NS(detr_dim=2304, out_dim=768),
              bert_joiner=NS(bert_dim=768, out_dim=768),
              text_decoder=NS(hidden_dim=768, dropout=0.1, nheads=8,
                              pos_enc=False, num_layers=3),
              co_att=co_att, losses=_ref_losses_cfg())


def _randomize_frozen_bn(model, seed):
    """FrozenBatchNorm2d initializes to the identity (backbone.py:27-33);
    randomize its buffers so the parity run exercises real BN math."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if type(m).__name__ == "FrozenBatchNorm2d":
            m.weight.normal_(1.0, 0.1, generator=g)
            m.bias.normal_(0.0, 0.1, generator=g)
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    import json

    from exp.gpv.models import gpv as ref_gpv_mod

    from gpv_tpu.models.gpv import GPV as FlaxGPV
    from gpv_tpu.text.vocab import SPECIAL_TOKENS, AnswerVocab
    from gpv_tpu.train.checkpoint import convert_gpv_torch

    tmp = tmp_path_factory.mktemp("ref_gpv")
    words = [f"w{i:05d}" for i in range(FV - 4)] + list(SPECIAL_TOKENS)
    vocab_path = tmp / "vocab.json"
    vocab_path.write_text(json.dumps(words))
    embed_path = tmp / "vocab_embed.npy"
    np.save(embed_path, 0.1 * np.random.RandomState(200).randn(FV, 768)
            .astype(np.float32))

    torch.manual_seed(200)
    orig_bert = ref_gpv_mod.Bert
    ref_gpv_mod.Bert = _StubBert
    try:
        ref = ref_gpv_mod.GPV(_released_cfg(vocab_path, embed_path))
    finally:
        ref_gpv_mod.Bert = orig_bert
    _randomize_frozen_bn(ref, 201)
    ref.eval()

    variables = convert_gpv_torch(sd_np(ref))
    model = FlaxGPV(vocab_size=FV, mask_query_pads=False)
    vocab = AnswerVocab(words)

    # inputs: released eval resolution + one natively-smaller padded sample
    from utils.detr_misc import nested_tensor_from_tensor_list
    g = torch.Generator().manual_seed(202)
    imgs = [torch.randn(3, 480, 640, generator=g),
            torch.randn(3, 440, 576, generator=g)]
    samples = nested_tensor_from_tensor_list(imgs)
    queries = ["what is sitting on the table", "dog"]

    images_j = jnp.asarray(samples.tensors.permute(0, 2, 3, 1).numpy())
    image_valid = jnp.asarray(~samples.mask.numpy())
    tok = _StubTokenizer()(queries)
    query_ids = jnp.asarray(tok["input_ids"].numpy())
    query_valid = jnp.asarray(tok["attention_mask"].numpy().astype(bool))

    return dict(ref=ref, model=model, variables=variables, vocab=vocab,
                samples=samples, queries=queries, images_j=images_j,
                image_valid=image_valid, query_ids=query_ids,
                query_valid=query_valid)


class TestStubSelfChecks:
    """The torchvision stub carries real math — pin it to independent
    references so e2e failures can't hide in the stub."""

    def test_roi_align_vs_numpy_oracle(self):
        from test_ops import _roi_align_ref
        rng = np.random.RandomState(0)
        feat = rng.randn(1, 5, 9, 12).astype(np.float32)
        boxes = []
        for _ in range(6):
            x0, y0 = rng.uniform(-1, 8, 2)
            w, h = rng.uniform(0.3, 6, 2)
            boxes.append([x0, y0, x0 + w, y0 + h])
        boxes = np.asarray(boxes, np.float32)
        got = _torchvision_stub.roi_align(
            torch.from_numpy(feat), [torch.from_numpy(boxes)], 7,
            aligned=True).numpy()
        ref = _roi_align_ref(feat[0], boxes)
        assert max_abs(got, ref) < 1e-5

    def test_resnet50_state_dict_naming(self):
        r50 = _torchvision_stub.resnet50(pretrained=True)
        keys = set(r50.state_dict().keys())
        for k in ("conv1.weight", "bn1.running_mean",
                  "layer1.0.downsample.0.weight",
                  "layer1.0.downsample.1.running_var", "layer2.0.conv2.weight",
                  "layer3.5.bn3.weight", "layer4.2.conv3.weight"):
            assert k in keys, k
        # C5 stride-32 feature grid
        body = _torchvision_stub.IntermediateLayerGetter(
            r50, {"layer4": "0"})
        out = body(torch.randn(1, 3, 64, 96))
        assert out["0"].shape == (1, 2048, 2, 3)


class TestReferenceGPVEndToEnd:
    def test_forward_teacher_forced(self, e2e):
        ref, model = e2e["ref"], e2e["model"]
        S = 12
        g = torch.Generator().manual_seed(203)
        answer_ids = torch.randint(0, FV, (2, S), generator=g)
        with torch.no_grad():
            out_ref = ref(e2e["samples"], e2e["queries"], answer_ids)

        out = model.apply(e2e["variables"], e2e["images_j"],
                          e2e["query_ids"], jnp.asarray(answer_ids.numpy()),
                          image_valid=e2e["image_valid"],
                          query_valid=e2e["query_valid"])

        err_box = max_abs(out["pred_boxes"], out_ref["pred_boxes"].numpy())
        err_rel = max_abs(out["pred_relevance_logits"],
                          out_ref["pred_relevance_logits"].numpy())
        ans_ref = out_ref["answer_logits"][0].numpy()
        err_ans = max_abs(out["answer_logits"], ans_ref)
        # logits spread ~10 units; measure error relative to that scale
        scale = float(np.abs(ans_ref).max())
        print(f"\n[e2e] boxes={err_box:.2e} relevance={err_rel:.2e} "
              f"answer_logits={err_ans:.2e} (scale {scale:.1f}, "
              f"rel {err_ans / scale:.2e})")
        assert err_box < 1e-3, f"pred_boxes diverged: {err_box}"
        assert err_rel < 1e-3, f"pred_relevance_logits diverged: {err_rel}"
        # 10k-way logits amplify the fp32 roundoff the 50-conv stack +
        # fusion accumulate (oneDNN vs XLA reduction orders); measured
        # 2.6e-3 absolute = ~1e-4 relative. Semantics guard: argmax exact.
        assert err_ans < 5e-3, f"answer_logits diverged: {err_ans}"
        assert err_ans / scale < 1e-3, f"relative logits error: {err_ans}"
        np.testing.assert_array_equal(
            np.argmax(np.asarray(out["answer_logits"]), -1),
            np.argmax(ans_ref, -1),
            err_msg="teacher-forced next-token argmax diverged")

    def test_greedy_matches_reference_k1_beam(self, e2e):
        from gpv_tpu.decode.greedy import greedy_decode
        ref, model, vocab = e2e["ref"], e2e["model"], e2e["vocab"]
        with torch.no_grad():
            out_ref = ref.forward_beam_search(e2e["samples"], e2e["queries"],
                                              beam_size=1)
        out = model.apply(e2e["variables"], e2e["images_j"],
                          e2e["query_ids"],
                          image_valid=e2e["image_valid"],
                          query_valid=e2e["query_valid"])
        tokens, _ = greedy_decode(model, e2e["variables"], out["memory"],
                                  None, vocab.cls_id, stop_id=vocab.stop_id)
        got = vocab.decode_ids(np.asarray(tokens))
        for b in range(2):
            assert got[b].split() == out_ref["answers"][b][0][:19], (
                f"sample {b}: ours={got[b]!r} "
                f"ref={out_ref['answers'][b][0]!r}")

    def test_beam_search_matches_reference(self, e2e):
        from gpv_tpu.decode.beam import beam_decode
        ref, model, vocab = e2e["ref"], e2e["model"], e2e["vocab"]
        K = 5
        with torch.no_grad():
            out_ref = ref.forward_beam_search(e2e["samples"], e2e["queries"],
                                              beam_size=K)
        out = model.apply(e2e["variables"], e2e["images_j"],
                          e2e["query_ids"],
                          image_valid=e2e["image_valid"],
                          query_valid=e2e["query_valid"])
        seqs, logp = beam_decode(model, e2e["variables"], out["memory"],
                                 None, vocab.cls_id, K)
        seqs, logp = np.asarray(seqs), np.asarray(logp)
        for b in range(2):
            for k in range(K):
                words, stopped = [], False
                for t in range(seqs.shape[-1]):
                    w = vocab.words[seqs[b, k, t]]
                    if w in ("__stop__", "__pad__"):
                        stopped = True
                        break
                    words.append(w)
                if not stopped:  # reference beam tail quirk (gpv.py:316-327)
                    words.append(vocab.words[0])
                assert words == out_ref["answers"][b][k], (
                    f"b={b} k={k}: ours={words} "
                    f"ref={out_ref['answers'][b][k]}")
                np.testing.assert_allclose(
                    math.exp(logp[b, k]), out_ref["answer_probs"][b][k],
                    atol=1e-4)
