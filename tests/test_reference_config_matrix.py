"""Composition parity vs the ACTUAL reference across the upstream-working
config matrix (VERDICT r4 next #4).

`tests/test_reference_gpv_e2e.py` proves the full composition at the
RELEASED default config (roi_head=True, vocab-embed answer head,
relevance conditioning on, no text pos-enc). The upstream-working
variants flip composition-level wiring the per-module tests cannot see:

  - `relevance_conditioning: False` (condition_on_relevance early-out,
                                  gpv.py:364-366)
  - `roi_head: False`            (plain DETR, detr.py via gpv.py:64-67 —
                                  256-d detr_hs into the joiner)
  - `roi_head: False + aux_loss: True` (aux plumbing through the plain
                                  DETR + the aux relevance add loop,
                                  gpv.py:161-168 — empty aux list at L=1)
  - `text_decoder.pos_enc: True` (1-D sine pos table added to the decode
                                  targets, gpv.py:449-466, incl. the
                                  incremental per-step slice in greedy)

Each combo runs the reference `GPV.forward` (teacher-forced) and
`forward_beam_search(K=1)` against the flax port through the production
converter at reduced-but-real dims (ResNet-50 (3,4,6,3) at 160x224,
bert-base, 1k vocab) — the composition wiring under test is
dims-independent; released dims are covered by the default-config e2e.

`answer_head: linear` is NOT in the matrix because it is upstream-CRASHING
dead code, proven by `test_linear_answer_head_crashes_upstream`:
LinearAnswerHead builds `nn.Linear(cfg.detr.hidden_dim=256, V)`
(answer_head.py:50-53, via build_answer_head:66-67) but `decode_text`
feeds it the `cfg.hidden_dim=768`-wide decoder output (gpv.py:449-466) —
a shape error in every shipped config's dims, and every shipped config
sets `answer_head: null` anyway (grep configs/). Our `answer_head=
'linear'` (gpv.py Dense(V) on the decoder width) is the dims-consistent
repair of that intent; its wiring is covered per-module in
tests/test_model.py.
"""
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import _torchvision_stub  # noqa: E402,F401
from test_reference_source import sd_np  # noqa: E402
from test_reference_gpv_e2e import (_StubBert, _StubTokenizer,  # noqa: E402
                                    _released_cfg, _randomize_frozen_bn,
                                    max_abs)

REF = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not mounted")]

FV = 1000
H, W = 160, 224

COMBOS = {
    "no_relevance_conditioning": dict(relevance_conditioning=False),
    "no_roi_head": dict(roi_head=False),
    "no_roi_aux_loss": dict(roi_head=False, aux_loss=True),
    "text_pos_enc": dict(text_pos_enc=True),
}


@pytest.fixture(autouse=True, scope="module")
def _cpu_cuda_noop():
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig


def _ref_cfg_for(tmp_path, combo):
    import json

    from gpv_tpu.text.vocab import SPECIAL_TOKENS

    words = [f"w{i:05d}" for i in range(FV - 4)] + list(SPECIAL_TOKENS)
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps(words))
    embed_path = tmp_path / "vocab_embed.npy"
    np.save(embed_path,
            0.1 * np.random.RandomState(77).randn(FV, 768).astype(np.float32))

    cfg = _released_cfg(vocab_path, embed_path)
    if combo.get("answer_head") == "linear":
        cfg.answer_head = "linear"
    if combo.get("relevance_conditioning") is False:
        cfg.relevance_conditioning = False
    if combo.get("roi_head") is False:
        cfg.roi_head = False
        # joiner input is the bare 256-d decoder states (configs/exp/
        # gpv.yaml: detr_joiner.detr_dim interpolates from roi_head)
        cfg.detr_joiner.detr_dim = 256
    if combo.get("aux_loss"):
        cfg.detr.aux_loss = True
    if combo.get("text_pos_enc"):
        cfg.text_decoder.pos_enc = True
    return cfg, words


def _build_pair(tmp_path, combo_name):
    """(ref model, flax model, converted variables, vocab, shared inputs)."""
    from exp.gpv.models import gpv as ref_gpv_mod

    from gpv_tpu.models.gpv import GPV as FlaxGPV
    from gpv_tpu.text.vocab import AnswerVocab
    from gpv_tpu.train.checkpoint import convert_gpv_torch

    combo = COMBOS[combo_name]
    cfg, words = _ref_cfg_for(tmp_path, combo)

    torch.manual_seed(500 + sorted(COMBOS).index(combo_name))
    orig_bert = ref_gpv_mod.Bert
    ref_gpv_mod.Bert = _StubBert
    try:
        ref = ref_gpv_mod.GPV(cfg)
    finally:
        ref_gpv_mod.Bert = orig_bert
    _randomize_frozen_bn(ref, 501)
    ref.eval()

    model = FlaxGPV(
        vocab_size=FV, mask_query_pads=False,
        answer_head=combo.get("answer_head"),
        relevance_conditioning=combo.get("relevance_conditioning", True),
        roi_head=combo.get("roi_head", True),
        text_pos_enc=bool(combo.get("text_pos_enc", False)),
        detr_cfg={"aux_loss": True} if combo.get("aux_loss") else None)
    variables = convert_gpv_torch(sd_np(ref))

    from utils.detr_misc import nested_tensor_from_tensor_list
    g = torch.Generator().manual_seed(502)
    imgs = [torch.randn(3, H, W, generator=g),
            torch.randn(3, H - 16, W - 32, generator=g)]
    samples = nested_tensor_from_tensor_list(imgs)
    queries = ["what is sitting on the table", "dog"]
    tok = _StubTokenizer()(queries)
    inputs = dict(
        samples=samples, queries=queries,
        images_j=jnp.asarray(samples.tensors.permute(0, 2, 3, 1).numpy()),
        image_valid=jnp.asarray(~samples.mask.numpy()),
        query_ids=jnp.asarray(tok["input_ids"].numpy()),
        query_valid=jnp.asarray(tok["attention_mask"].numpy().astype(bool)))
    return ref, model, variables, AnswerVocab(words), inputs


@pytest.mark.parametrize("combo_name", sorted(COMBOS))
def test_forward_and_greedy_composition(tmp_path, combo_name):
    from gpv_tpu.decode.greedy import greedy_decode

    ref, model, variables, vocab, inp = _build_pair(tmp_path, combo_name)

    # ---- teacher-forced forward ----
    S = 10
    g = torch.Generator().manual_seed(503)
    answer_ids = torch.randint(0, FV, (2, S), generator=g)
    with torch.no_grad():
        out_ref = ref(inp["samples"], inp["queries"], answer_ids)
    out = model.apply(variables, inp["images_j"], inp["query_ids"],
                      jnp.asarray(answer_ids.numpy()),
                      image_valid=inp["image_valid"],
                      query_valid=inp["query_valid"])

    err_box = max_abs(out["pred_boxes"], out_ref["pred_boxes"].numpy())
    err_rel = max_abs(out["pred_relevance_logits"],
                      out_ref["pred_relevance_logits"].numpy())
    ans_ref = out_ref["answer_logits"][0].numpy()
    err_ans = max_abs(out["answer_logits"], ans_ref)
    scale = float(np.abs(ans_ref).max())
    print(f"\n[{combo_name}] boxes={err_box:.2e} relevance={err_rel:.2e} "
          f"answer_logits={err_ans:.2e} (scale {scale:.1f})")
    assert err_box < 1e-3, f"{combo_name}: pred_boxes {err_box}"
    assert err_rel < 1e-3, f"{combo_name}: relevance {err_rel}"
    assert err_ans < 5e-3 and err_ans / scale < 1e-3, (
        f"{combo_name}: answer_logits {err_ans}")
    np.testing.assert_array_equal(
        np.argmax(np.asarray(out["answer_logits"]), -1),
        np.argmax(ans_ref, -1),
        err_msg=f"{combo_name}: teacher-forced argmax")
    if combo_name == "no_roi_aux_loss":
        # eval-mode aux plumbing: the reference emits an EMPTY aux list
        # (L=1 at eval, detr.py:66-72) — the add loop at gpv.py:161-168
        # must no-op, which the relevance equality above already pins;
        # assert the reference side really took that path
        assert out_ref.get("aux_outputs") == []

    # ---- greedy == reference K=1 beam ----
    with torch.no_grad():
        out_bs = ref.forward_beam_search(inp["samples"], inp["queries"],
                                         beam_size=1)
    tokens, _ = greedy_decode(model, variables, out["memory"], None,
                              vocab.cls_id, stop_id=vocab.stop_id)
    got = vocab.decode_ids(np.asarray(tokens))
    for b in range(2):
        assert got[b].split() == out_bs["answers"][b][0][:19], (
            f"{combo_name} sample {b}: ours={got[b]!r} "
            f"ref={out_bs['answers'][b][0]!r}")


def test_linear_answer_head_crashes_upstream(tmp_path):
    """`answer_head: linear` is dead code in the reference: the head is
    nn.Linear(detr.hidden_dim=256, V) but receives the 768-wide decoder
    output, so GPV.forward raises a shape RuntimeError in the released
    dims (and no shipped config enables it — configs/exp/*.yaml all set
    answer_head: null). This pins the reason the combo is absent from
    COMBOS above; if upstream were fixed, this test failing would flag
    that the matrix needs the combo back."""
    from exp.gpv.models import gpv as ref_gpv_mod

    cfg, _ = _ref_cfg_for(tmp_path, dict(answer_head="linear"))
    torch.manual_seed(499)
    orig_bert = ref_gpv_mod.Bert
    ref_gpv_mod.Bert = _StubBert
    try:
        ref = ref_gpv_mod.GPV(cfg)
    finally:
        ref_gpv_mod.Bert = orig_bert
    ref.eval()

    from utils.detr_misc import nested_tensor_from_tensor_list
    g = torch.Generator().manual_seed(498)
    samples = nested_tensor_from_tensor_list(
        [torch.randn(3, H, W, generator=g)])
    answer_ids = torch.randint(0, FV, (1, 4), generator=g)
    with pytest.raises(RuntimeError, match="shapes cannot be multiplied"), \
            torch.no_grad():
        ref(samples, ["dog"], answer_ids)
