"""Quantify PARITY.md #12: query-pad masking in fusion/decode.

The reference passes NO attention masks to co-attention (gpv.py:149-153) and
none over the decode memory (gpv.py:466), so padded batched runs attend over
BERT pad states and outputs depend on batch composition; batch-1 runs have no
pads. This framework defaults to masking (batch-1 semantics at any batch) and
offers `mask_query_pads=False` for bit-parity with upstream batched eval.

These tests PROVE the default equals batch-1 outputs and MEASURE the
reference-style batched drift (numbers recorded in PARITY.md #12).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.decode.greedy import greedy_decode
from gpv_tpu.models.gpv import GPV

from test_model import VOCAB, tiny_gpv

H, W = 48, 64
LENS = (2, 7)  # one padded + the full length; each extra length costs a
               # separate batch-1 encode+decode compile (suite-speed budget)
TQ = max(LENS)


@pytest.fixture(scope="module")
def setup():
    model = tiny_gpv()
    rng = np.random.RandomState(3)
    B = len(LENS)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    qids = jnp.asarray(rng.randint(1, 100, (B, TQ)).astype(np.int32))
    qvalid = jnp.asarray(
        np.arange(TQ)[None, :] < np.asarray(LENS)[:, None])
    from conftest import tiny_init
    variables = tiny_init(model)
    # reference-batched variant shares the SAME weights (flag is not a param)
    model_ref = tiny_gpv(mask_query_pads=False)
    return model, model_ref, variables, images, qids, qvalid


def run(model, variables, images, qids, qvalid):
    memory, mem_valid, outputs = model.apply(
        variables, images, qids, query_valid=qvalid, method=GPV.encode)
    rel = jax.nn.softmax(
        outputs["pred_relevance_logits"].astype(jnp.float32), -1)[..., 0]
    tokens, _ = greedy_decode(model, variables, memory, mem_valid, 0)
    return (np.asarray(rel), np.asarray(outputs["pred_boxes"]),
            np.asarray(tokens))


class TestPadSemantics:
    def test_masked_batched_equals_batch1(self, setup):
        """Default path: padded batched outputs == per-sample unpadded runs
        (batch-1 semantics at any batch composition)."""
        model, _, variables, images, qids, qvalid = setup
        rel_b, boxes_b, tok_b = run(model, variables, images, qids, qvalid)
        for i, ln in enumerate(LENS):
            rel_1, boxes_1, tok_1 = run(
                model, variables, images[i:i + 1], qids[i:i + 1, :ln],
                jnp.ones((1, ln), bool))
            np.testing.assert_allclose(rel_b[i], rel_1[0], atol=2e-5)
            np.testing.assert_allclose(boxes_b[i], boxes_1[0], atol=2e-5)
            np.testing.assert_array_equal(tok_b[i], tok_1[0])

    def test_reference_batched_drift_is_measurable(self, setup):
        """Reference-style no-mask fusion/decode: quantify the batched-vs-
        batch-1 drift the reference itself exhibits. The padded samples
        (len < TQ) must drift; the full-length sample has no pads and must
        not."""
        model, model_ref, variables, images, qids, qvalid = setup
        rel_r, boxes_r, tok_r = run(model_ref, variables, images, qids,
                                    qvalid)
        drifts = []
        for i, ln in enumerate(LENS):
            rel_1, boxes_1, tok_1 = run(
                model, variables, images[i:i + 1], qids[i:i + 1, :ln],
                jnp.ones((1, ln), bool))
            rel_d = float(np.max(np.abs(rel_r[i] - rel_1[0])))
            box_d = float(np.max(np.abs(boxes_r[i] - boxes_1[0])))
            tok_agree = float(np.mean(tok_r[i] == tok_1[0]))
            drifts.append((ln, rel_d, box_d, tok_agree))
            print(f"len={ln}/{TQ}: |Δrelevance|max={rel_d:.4f} "
                  f"|Δbox|max={box_d:.4f} token-agreement={tok_agree:.2f}")
        # full-length sample (no pads) bit-matches batch-1
        ln, rel_d, box_d, tok_agree = drifts[-1]
        assert ln == TQ
        assert rel_d < 2e-5 and box_d < 2e-5 and tok_agree == 1.0
        # padded samples measurably diverge — this is the reference's own
        # batched-eval batch-dependence, not a bug here
        assert max(d[1] for d in drifts[:-1]) > 1e-4

    def test_flag_is_parameter_compatible(self, setup):
        """mask_query_pads changes no parameters: the same variables apply
        to both variants."""
        model, model_ref, variables, images, qids, qvalid = setup
        out = model_ref.apply(variables, images, qids,
                              query_valid=qvalid, method=GPV.encode)
        assert out[0].shape[0] == len(LENS)
