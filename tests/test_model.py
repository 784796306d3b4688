"""Model-level tests: forward shapes, KV-cache decode consistency, beam search,
and the multitask criterion — all on a tiny GPV so CPU jit stays fast."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.decode import beam_decode, greedy_decode
from gpv_tpu.losses import LossConfig, TASK_IDS, gpv_criterion
from gpv_tpu.models.gpv import GPV


VOCAB = 64
B, H, W = 2, 48, 64


def tiny_gpv(**kw):
    detr_cfg = dict(num_queries=10, num_classes=1, hidden_dim=32, nheads=4,
                    num_encoder_layers=2, num_decoder_layers=2,
                    dim_feedforward=64, dropout=0.0)
    args = dict(vocab_size=VOCAB, hidden_dim=32, max_text_len=8,
                co_att_num_layers=2, co_att_heads=4, co_att_intermediate=64,
                dropout=0.0, text_decoder_layers=2, text_decoder_heads=4,
                detr_cfg=detr_cfg, roi_head=True, bert_layers=2,
                bert_hidden=32, bert_heads=4, bert_vocab_size=100)
    args.update(kw)
    return GPV(**args)


@pytest.fixture(scope="module")
def model_and_vars():
    from conftest import tiny_init
    model = tiny_gpv()
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3))
    qids = jax.random.randint(jax.random.PRNGKey(2), (B, 5), 0, 100)
    variables = tiny_init(model)
    return model, variables, imgs, qids


class TestForward:
    def test_shapes(self, model_and_vars):
        model, variables, imgs, qids = model_and_vars
        aids = jnp.zeros((B, 8), jnp.int32)
        out = model.apply(variables, imgs, qids, aids, train=False)
        assert out["pred_relevance_logits"].shape == (B, 10, 2)
        assert out["pred_boxes"].shape == (B, 10, 4)
        assert out["answer_logits"].shape == (B, 7, VOCAB)
        assert out["memory"].shape == (B, 15, 32)
        assert np.isfinite(np.asarray(out["answer_logits"])).all()

    def test_boxes_in_unit_range(self, model_and_vars):
        model, variables, imgs, qids = model_and_vars
        out = model.apply(variables, imgs, qids, train=False)
        b = np.asarray(out["pred_boxes"])
        assert (b >= 0).all() and (b <= 1).all()


class TestDecode:
    def test_greedy_matches_teacher_forced(self, model_and_vars):
        """KV-cached incremental decode == full-prefix re-decode (reference
        semantics: gpv.py:178-196 recomputes the prefix each step)."""
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        cls_id = 1
        tokens, logits = greedy_decode(model, variables, memory, mem_valid,
                                       cls_id)
        assert tokens.shape == (B, 7)
        # rebuild the full sequence and teacher-force it
        full = jnp.concatenate(
            [jnp.full((B, 1), cls_id, jnp.int32), tokens], axis=1)
        out = model.apply(variables, imgs, qids, full, train=False)
        tf_logits = out["answer_logits"]  # (B, 7, V)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(tf_logits),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(tf_logits, -1)), np.asarray(tokens))

    def test_early_exit_greedy_matches_full(self, model_and_vars):
        """while_loop early-exit decode == scan decode up to the first stop
        token (positions after stop are never read)."""
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        full_tokens, _ = greedy_decode(model, variables, memory, mem_valid,
                                       1)
        stop_id = int(np.asarray(full_tokens)[0, 0])  # force quick stop
        ee_tokens, _ = greedy_decode(model, variables, memory, mem_valid, 1,
                                     stop_id=stop_id)
        full = np.asarray(full_tokens)
        ee = np.asarray(ee_tokens)
        for b in range(full.shape[0]):
            stops = np.where(full[b] == stop_id)[0]
            end = stops[0] + 1 if len(stops) else full.shape[1]
            np.testing.assert_array_equal(ee[b, :end], full[b, :end])
            # beyond the stop: either still matches (loop alive for other
            # rows) or is the stop_id prefill (loop exited)
            for t in range(end, full.shape[1]):
                assert ee[b, t] in (full[b, t], stop_id)

    def test_vocab_mask(self, model_and_vars):
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        mask = np.full((VOCAB,), -10000.0, np.float32)
        allowed = [3, 5, 7]
        for a in allowed:
            mask[a] = 0.0
        tokens, _ = greedy_decode(model, variables, memory, mem_valid, 1,
                                  vocab_mask=jnp.asarray(mask))
        assert set(np.asarray(tokens).ravel()).issubset(set(allowed))

    def test_beam1_equals_greedy(self, model_and_vars):
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        g_tokens, g_logits = greedy_decode(model, variables, memory,
                                           mem_valid, 1)
        seqs, logp = beam_decode(model, variables, memory, mem_valid, 1,
                                 beam_size=1)
        np.testing.assert_array_equal(np.asarray(seqs[:, 0]),
                                      np.asarray(g_tokens))
        # beam log-prob should equal sum of greedy per-step log-probs
        lsm = jax.nn.log_softmax(g_logits, axis=-1)
        picked = jnp.take_along_axis(lsm, g_tokens[..., None], -1)[..., 0]
        np.testing.assert_allclose(np.asarray(logp[:, 0]),
                                   np.asarray(picked.sum(-1)),
                                   atol=1e-3, rtol=1e-4)

    def test_beam_group_step_equals_tiled_kv(self, model_and_vars):
        """text_step(beam_group=K) over UNTILED (B,.) memory K/V must equal
        the plain step over K-fold pre-repeated K/V: the K beams of a sample
        share cross-attention keys/values, so routing the beam axis through
        the attention query-sequence axis is the same math (decode/beam.py
        relies on this to avoid tiling the decode state K-fold)."""
        from gpv_tpu.decode.greedy import init_cache
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        K = 3
        mem_state = model.apply(variables, memory,
                                method=GPV.precompute_text_memory)
        mem_kvs, classifier = mem_state
        tiled_kvs = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), mem_kvs)
        tiled_valid = (jnp.repeat(mem_valid, K, axis=0)
                       if mem_valid is not None else None)

        tok = jax.random.randint(jax.random.PRNGKey(7), (B * K,), 0, VOCAB)
        cache_a = init_cache(model, B * K)
        cache_b = init_cache(model, B * K)
        for t in range(3):
            logits_a, cache_a = model.apply(
                variables, tok, mem_state, mem_valid, cache_a, t,
                beam_group=K, method=GPV.text_step)
            logits_b, cache_b = model.apply(
                variables, tok, (tiled_kvs, classifier), tiled_valid,
                cache_b, t, method=GPV.text_step)
            np.testing.assert_allclose(np.asarray(logits_a),
                                       np.asarray(logits_b),
                                       atol=1e-5, rtol=1e-5)
            tok = jnp.argmax(logits_a, axis=-1).astype(jnp.int32)
        for ca, cb in zip(jax.tree.leaves(cache_a), jax.tree.leaves(cache_b)):
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                       atol=1e-5, rtol=1e-5)

    def test_beam_scores_sorted_and_consistent(self, model_and_vars):
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        K = 3
        seqs, logp = beam_decode(model, variables, memory, mem_valid, 1,
                                 beam_size=K)
        lp = np.asarray(logp)
        assert (np.diff(lp, axis=1) <= 1e-5).all(), "beams sorted desc"
        # each beam's score == sum of teacher-forced log-probs of its tokens
        for k in range(K):
            full = jnp.concatenate(
                [jnp.full((B, 1), 1, jnp.int32), seqs[:, k]], axis=1)
            out = model.apply(variables, imgs, qids, full, train=False)
            lsm = jax.nn.log_softmax(out["answer_logits"], -1)
            picked = jnp.take_along_axis(
                lsm, seqs[:, k][..., None], -1)[..., 0].sum(-1)
            np.testing.assert_allclose(lp[:, k], np.asarray(picked),
                                       atol=2e-3, rtol=1e-3)


class TestEngineNativeRes:
    def test_predict_native_buckets(self):
        from gpv_tpu.engine import GPVEngine
        from gpv_tpu.text.vocab import AnswerVocab
        from gpv_tpu.text.wordpiece import WordPieceTokenizer
        model = tiny_gpv()
        rng = np.random.RandomState(0)
        vocab = AnswerVocab.debug(size=VOCAB)
        engine = GPVEngine(model, None, vocab, WordPieceTokenizer.debug())
        from conftest import tiny_init
        engine.variables = tiny_init(model)
        images = [rng.randint(0, 255, (50, 70, 3), np.uint8),
                  rng.randint(0, 255, (90, 120, 3), np.uint8),
                  rng.randint(0, 255, (60, 60, 3), np.uint8)]
        out = engine.predict_native(images, ["a", "b", "c"], bucket=64)
        assert len(out) == 3
        for o in out:
            assert isinstance(o["answer"], str)
            assert o["boxes"].shape == (10, 4)
            assert np.isfinite(o["boxes"]).all()
            # relevance sorted descending
            assert (np.diff(o["relevance"]) <= 1e-6).all()


class TestBeamReferenceSemantics:
    @pytest.mark.slow  # 28 s; quick-suite beam coverage lives in
    # test_reference_source (parity vs the reference's own beam)
    def test_matches_slow_python_beam(self, model_and_vars):
        """Batched beam_decode == a slow Python replica of the reference
        algorithm's effective semantics (k1-major candidate ordering, t=0
        beam-0 collapse, accumulated log-probs incl. post-stop)."""
        model, variables, imgs, qids = model_and_vars
        memory, mem_valid, _ = model.apply(variables, imgs, qids,
                                           method=GPV.encode)
        K = 3
        T1 = model.max_text_len - 1
        Bn = memory.shape[0]
        cls_id = 1

        def tf_last_logprobs(prefix_ids):
            """(B, S) prefixes -> (B, V) next-token log-probs: right-pad to
            a FIXED max_text_len and read position S-1 (the causal mask
            makes trailing pad tokens inert) so every call reuses one
            compiled teacher-forced forward instead of one per prefix
            length."""
            S = prefix_ids.shape[1]
            dummy = np.zeros((Bn, model.max_text_len), np.int64)
            dummy[:, :S] = prefix_ids
            out = model.apply(variables, imgs, qids,
                              jnp.asarray(dummy, jnp.int32), train=False)
            logits = np.asarray(out["answer_logits"][:, S - 1],
                                np.float64)
            lsm = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            return lsm

        prefixes = [np.full((Bn, 1), cls_id, np.int64) for _ in range(K)]
        seq_lp = np.zeros((Bn, K))
        seqs = np.zeros((Bn, K, T1), np.int64)
        for t in range(T1):
            cand_scores = np.full((Bn, K, K), -np.inf)
            cand_ids = np.zeros((Bn, K, K), np.int64)
            for k1 in range(K):
                lsm = tf_last_logprobs(prefixes[k1])  # (B, V)
                top = np.argsort(-lsm, axis=-1, kind="stable")[:, :K]
                vals = np.take_along_axis(lsm, top, -1)
                sc = seq_lp[:, k1:k1 + 1] + vals
                if t == 0 and k1 > 0:
                    sc = sc * 0 - 1e9
                cand_scores[:, k1] = sc
                cand_ids[:, k1] = top
            flat = cand_scores.reshape(Bn, K * K)
            order = np.argsort(-flat, axis=-1, kind="stable")[:, :K]
            new_prefixes = [np.zeros((Bn, t + 2), np.int64)
                            for _ in range(K)]
            new_seqs = np.zeros_like(seqs)
            new_lp = np.zeros((Bn, K))
            for b in range(Bn):
                for k, idx in enumerate(order[b]):
                    k1, k2 = idx // K, idx % K
                    tok = cand_ids[b, k1, k2]
                    new_prefixes[k][b] = np.concatenate(
                        [prefixes[k1][b], [tok]])
                    new_seqs[b, k, :t] = seqs[b, k1, :t]
                    new_seqs[b, k, t] = tok
                    new_lp[b, k] = flat[b, idx]
            prefixes, seqs, seq_lp = new_prefixes, new_seqs, new_lp

        got_seqs, got_lp = beam_decode(model, variables, memory, mem_valid,
                                       cls_id, K)
        np.testing.assert_allclose(np.asarray(got_lp), seq_lp, atol=2e-3,
                                   rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(got_seqs), seqs)


class TestCriterion:
    def _batch(self, task_names, answer_ids=None, boxes=None, box_valid=None):
        Bn = len(task_names)
        S, M = 8, 4
        rng = np.random.RandomState(0)
        batch = {
            "answer_ids": jnp.asarray(
                answer_ids if answer_ids is not None
                else rng.randint(0, VOCAB, (Bn, S)).astype(np.int32)),
            "answer_lens": jnp.full((Bn,), 5, jnp.int32),
            "task_id": jnp.asarray([TASK_IDS[t] for t in task_names]),
            "has_answer": jnp.asarray(
                [t != "CocoDetection" and t != "RefCocop"
                 for t in task_names]),
            "boxes": jnp.asarray(
                boxes if boxes is not None
                else rng.uniform(0.3, 0.6, (Bn, M, 4)).astype(np.float32)),
            "box_labels": jnp.zeros((Bn, M), jnp.int32),
            "box_valid": jnp.asarray(
                box_valid if box_valid is not None
                else np.tile([True, True, False, False], (Bn, 1))),
            "has_boxes": jnp.asarray(
                [t in ("CocoDetection", "RefCocop") for t in task_names]),
        }
        return batch

    def _outputs(self, Bn, Q=10, seed=0):
        rng = np.random.RandomState(seed)
        return {
            "pred_relevance_logits": jnp.asarray(
                rng.randn(Bn, Q, 2).astype(np.float32)),
            "pred_boxes": jnp.asarray(
                rng.uniform(0.2, 0.8, (Bn, Q, 4)).astype(np.float32)),
            "answer_logits": jnp.asarray(
                rng.randn(Bn, 7, VOCAB).astype(np.float32)),
        }

    def test_total_finite_and_composed(self):
        tasks = ["CocoCaptioning", "CocoVqa", "CocoDetection",
                 "CocoClassification"]
        batch = self._batch(tasks)
        out = self._outputs(len(tasks))
        total, losses = gpv_criterion(out, batch, LossConfig())
        assert np.isfinite(float(total))
        for k in ("loss_caption", "loss_vqa", "loss_cls", "loss_ce",
                  "loss_bbox", "loss_giou"):
            assert k in losses and np.isfinite(float(losses[k]))
        # manual composition
        cfg = LossConfig()
        expect = (cfg.caption_wt * losses["loss_caption"]
                  + cfg.vqa_wt * losses["loss_vqa"]
                  + cfg.cls_wt * losses["loss_cls"]
                  + cfg.loss_ce_wt * losses["loss_ce"]
                  + cfg.loss_bbox_wt * losses["loss_bbox"]
                  + cfg.loss_giou_wt * losses["loss_giou"])
        np.testing.assert_allclose(float(total), float(expect), rtol=1e-5)

    def test_absent_task_contributes_zero(self):
        tasks = ["CocoDetection", "CocoDetection"]
        batch = self._batch(tasks)
        out = self._outputs(2)
        total, losses = gpv_criterion(out, batch, LossConfig())
        cfg = LossConfig()
        expect = (cfg.loss_ce_wt * losses["loss_ce"]
                  + cfg.loss_bbox_wt * losses["loss_bbox"]
                  + cfg.loss_giou_wt * losses["loss_giou"])
        np.testing.assert_allclose(float(total), float(expect), rtol=1e-5)

    def test_perfect_boxes_zero_box_loss(self):
        """If predictions contain the GT boxes exactly, matched L1/GIoU ~ 0."""
        tasks = ["CocoDetection"]
        M, Q = 4, 10
        gt = np.asarray([[[0.3, 0.3, 0.1, 0.1], [0.6, 0.6, 0.2, 0.2],
                          [0.5, 0.5, 0.5, 0.5], [0.2, 0.7, 0.1, 0.2]]],
                        np.float32)
        valid = np.asarray([[True, True, False, False]])
        batch = self._batch(tasks, boxes=gt, box_valid=valid)
        out = self._outputs(1, Q)
        pb = np.asarray(out["pred_boxes"]).copy()
        pb[0, 0] = gt[0, 0]
        pb[0, 1] = gt[0, 1]
        logits = np.full((1, Q, 2), 0.0, np.float32)
        logits[:, :, 1] = 5.0   # default: confident no-object
        logits[0, 0] = [5.0, 0.0]
        logits[0, 1] = [5.0, 0.0]
        out["pred_boxes"] = jnp.asarray(pb)
        out["pred_relevance_logits"] = jnp.asarray(logits)
        _, losses = gpv_criterion(out, batch, LossConfig())
        assert float(losses["loss_bbox"]) < 1e-6
        assert float(losses["loss_giou"]) < 1e-5

    def test_text_ce_matches_manual(self):
        """Per-task CE = mean over task samples of summed sequence CE."""
        tasks = ["CocoVqa", "CocoVqa", "CocoCaptioning"]
        batch = self._batch(tasks)
        out = self._outputs(3)
        _, losses = gpv_criterion(out, batch, LossConfig())
        logits = np.asarray(out["answer_logits"], np.float64)
        tgts = np.asarray(batch["answer_ids"])[:, 1:]
        lens = np.asarray(batch["answer_lens"])
        smax = lens.max()
        lsm = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        ce = -np.take_along_axis(lsm, tgts[..., None], -1)[..., 0]
        ce = ce[:, :smax - 1]
        vqa_ref = ce[:2].sum(1).mean()
        cap_ref = ce[2:3].sum(1).mean()
        np.testing.assert_allclose(float(losses["loss_vqa"]), vqa_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(losses["loss_caption"]), cap_ref,
                                   rtol=1e-4)
