"""Distributed training tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.losses import LossConfig, TASK_IDS
from gpv_tpu.parallel import (create_train_state, make_mesh, make_train_step,
                              shard_batch)
from gpv_tpu.train import build_optimizer, param_group, warmup_linear_schedule
from gpv_tpu.utils.config import ConfigNode

from test_model import tiny_gpv, VOCAB


def make_batch(B=8, S=8, M=4, seed=0):
    rng = np.random.RandomState(seed)
    tasks = [["CocoCaptioning", "CocoVqa", "CocoClassification",
              "CocoDetection"][i % 4] for i in range(B)]
    return {
        "image": rng.randn(B, 48, 64, 3).astype(np.float32),
        "query_ids": rng.randint(0, 100, (B, 5)).astype(np.int32),
        "query_valid": np.ones((B, 5), bool),
        "answer_ids": rng.randint(0, VOCAB, (B, S)).astype(np.int32),
        "answer_lens": np.full((B,), 5, np.int32),
        "task_id": np.asarray([TASK_IDS[t] for t in tasks], np.int32),
        "has_answer": np.asarray([t != "CocoDetection" for t in tasks]),
        "boxes": rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32),
        "box_labels": np.zeros((B, M), np.int32),
        "box_valid": np.tile([True, True, False, False], (B, 1)),
        "has_boxes": np.asarray([t == "CocoDetection" for t in tasks]),
    }


def training_cfg(**kw):
    cfg = ConfigNode({
        "num_epochs": 2, "lr": 1e-3, "lr_backbone": 1e-4,
        "weight_decay": 1e-4, "lr_milestones": [10], "lr_drop": 0.5,
        "lr_warmup": True, "lr_linear_decay": True,
        "lr_warmup_fraction": 0.1, "clip_max_norm": 0.1, "freeze": False,
    })
    cfg.update(kw)
    return cfg




def init_vars(model):
    """Session-memoized `model.init` (shared across test modules via
    conftest.tiny_init — suite speed, VERDICT r2 item 9)."""
    from conftest import tiny_init
    return tiny_init(model)


class TestMeshValidation:
    def test_multihost_tp_rejected(self):
        """Multi-host + model axis >1 must fail at construction: rank-0
        save/eval materialize addressable_data(0), which is one SHARD of a
        cross-host sharded param (silent checkpoint corruption)."""
        from gpv_tpu.parallel.mesh import validate_multihost_mesh
        # fine: single-process TP, multi-host pure DP
        validate_multihost_mesh(make_mesh(data=4, model=2), n_processes=1)
        validate_multihost_mesh(make_mesh(data=8, model=1), n_processes=4)
        with pytest.raises(ValueError,
                           match="multi-host tensor parallelism"):
            validate_multihost_mesh(make_mesh(data=4, model=2),
                                    n_processes=2)


class TestOptimizer:
    def test_param_groups(self):
        # backbone stem is PERMANENTLY frozen upstream (Backbone sets
        # requires_grad_(False) on every body param without layer2/3/4 in
        # its name, backbone.py:61-63) — only layer2/3/4 get backbone lr
        assert param_group(("detr", "backbone", "conv1", "kernel")) == "frozen"
        assert param_group(("detr", "backbone", "layer1", "block0", "conv1",
                            "kernel")) == "frozen"
        for layer in ("layer2", "layer3", "layer4"):
            assert param_group(("detr", "backbone", layer, "block0", "conv1",
                                "kernel")) == "detr_backbone"
        # learned 2-D posenc: upstream name detr.backbone.1.* -> backbone lr
        # group, but NOT frozen (BackboneBase only freezes body params)
        assert param_group(("detr", "position_embedding",
                            "row_embed")) == "detr_backbone"
        assert param_group(("detr", "transformer", "x")) == "detr_head"
        assert param_group(("detr_joiner", "kernel")) == "detr_joiner"
        assert param_group(("bert", "layer0", "x")) == "frozen"
        assert param_group(("vocab_embed",)) == "frozen"
        # dead params (upstream grad stays None, AdamW skips them)
        assert param_group(("vision_token",)) == "frozen"
        assert param_group(("lang_token",)) == "frozen"
        assert param_group(("co_att0", "dense1", "kernel")) == "others"

    def test_warmup_linear(self):
        # lr at update n = base * lam(n+1) — torch LambdaLR constructor-step
        # semantics (see warmup_linear_schedule docstring); warmup=10 steps
        s = warmup_linear_schedule(1.0, 100, 0.1)
        assert abs(float(s(4)) - 0.5) < 1e-6   # lam(5) = 5/10
        assert abs(float(s(9)) - 1.0) < 1e-6   # lam(10) = (100-10)/90
        assert abs(float(s(54)) - (100 - 55) / 90.0) < 1e-6
        assert float(s(99)) == 0.0             # lam(100) = 0
        assert float(s(100)) == 0.0


@pytest.mark.slow
class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        mesh = make_mesh(data=8)
        model = tiny_gpv()
        batch = make_batch(B=8)
        variables = init_vars(model)
        optimizer = build_optimizer(training_cfg(), steps_per_epoch=10,
                                    params=variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1, mesh=mesh,
                               donate=False)
        return mesh, model, state, step, batch

    def test_two_steps_loss_finite_and_params_move(self, setup):
        mesh, model, state, step, batch = setup
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        rng = jax.random.PRNGKey(42)
        p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
        state1, losses1 = step(state, sharded, rng)
        state2, losses2 = step(state1, sharded, rng)
        for k, v in losses2.items():
            assert np.isfinite(float(v)), k
        assert int(state2.step) == 2
        # trainable params moved
        moved = np.abs(np.asarray(state2.params["detr_joiner"]["kernel"])
                       - p0["detr_joiner"]["kernel"]).max()
        assert moved > 0
        # frozen groups untouched
        np.testing.assert_array_equal(
            np.asarray(state2.params["vocab_embed"]), p0["vocab_embed"])
        b0 = p0["bert"]["embeddings"]["word_embeddings"]["embedding"]
        np.testing.assert_array_equal(
            np.asarray(state2.params["bert"]["embeddings"]
                       ["word_embeddings"]["embedding"]), b0)

    def test_loss_decreases_over_steps(self, setup):
        mesh, model, state, step, batch = setup
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        rng = jax.random.PRNGKey(0)
        first = None
        for i in range(8):
            state, losses = step(state, sharded, rng)
            if first is None:
                first = float(losses["total_loss"])
        assert float(losses["total_loss"]) < first

    def test_tensor_parallel_mesh(self):
        """(data=4, model=2) mesh: TP param shardings compile, execute, and
        match the pure-DP loss."""
        from gpv_tpu.parallel import make_param_shardings
        from jax.sharding import PartitionSpec as P

        batch = make_batch(B=8)
        model = tiny_gpv()
        variables = init_vars(model)
        optimizer = build_optimizer(training_cfg(), 10, variables["params"])

        def run(mesh_kw):
            mesh = make_mesh(**mesh_kw)
            state = create_train_state(variables, optimizer)
            step = make_train_step(model, optimizer, LossConfig(), 0.1,
                                   mesh=mesh, donate=False,
                                   state_template=state)
            sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
            _, losses = step(state, sharded, jax.random.PRNGKey(1))
            return float(losses["total_loss"])

        dp = run(dict(data=8, model=1))
        tp = run(dict(data=4, model=2))
        assert np.isfinite(tp)
        np.testing.assert_allclose(tp, dp, rtol=1e-4)

    def test_tp_sharded_inference(self):
        """shard_params-placed weights run inference on a (4,2) mesh and
        match replicated outputs."""
        from gpv_tpu.parallel import make_mesh, shard_params
        model = tiny_gpv()
        imgs = jnp.zeros((4, 48, 64, 3))
        qids = jnp.zeros((4, 5), jnp.int32)
        variables = init_vars(model)
        ref = model.apply(variables, imgs, qids, train=False)

        mesh = make_mesh(data=4, model=2)
        sharded_params = shard_params(variables["params"], mesh)
        out = model.apply({"params": sharded_params,
                           "batch_stats": variables["batch_stats"]},
                          imgs, qids, train=False)
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"], np.float32),
            np.asarray(ref["pred_boxes"], np.float32), atol=1e-5)

    def test_partition_specs(self):
        from gpv_tpu.parallel import param_partition_spec
        from jax.sharding import PartitionSpec as P
        import types
        leaf2d = types.SimpleNamespace(shape=(32, 64), ndim=2)
        assert param_partition_spec(("x", "q_proj", "kernel"), leaf2d) == \
            P(None, "model")
        assert param_partition_spec(("x", "out_proj", "kernel"), leaf2d) == \
            P("model", None)
        assert param_partition_spec(("x", "norm1", "scale"),
                                    types.SimpleNamespace(shape=(32,),
                                                          ndim=1)) == P()

    def test_aux_loss_training(self):
        """aux_loss=True: per-layer localization losses flow and train."""
        mesh = make_mesh(data=8)
        batch = make_batch(B=8)
        model = tiny_gpv(detr_cfg=dict(
            num_queries=10, num_classes=1, hidden_dim=32, nheads=4,
            num_encoder_layers=2, num_decoder_layers=2, dim_feedforward=64,
            dropout=0.0, aux_loss=True, last_layer_only=False))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
            jnp.asarray(batch["query_ids"]),
            jnp.asarray(batch["answer_ids"]), train=True)
        optimizer = build_optimizer(training_cfg(), 10, variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=mesh, donate=False)
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        state, losses = step(state, sharded, jax.random.PRNGKey(1))
        assert "loss_ce_0" in losses and np.isfinite(float(losses["loss_ce_0"]))
        assert np.isfinite(float(losses["total_loss"]))

    def test_remat_model_trains(self):
        """remat=True model: one step runs, loss finite, close to no-remat."""
        mesh = make_mesh(data=8)
        batch = make_batch(B=8)

        def run(remat):
            # dropout>0 covers the static-deterministic remat path (dropout
            # is still inactive here because the step uses train=True with
            # fold_in rng; losses compare only between remat settings)
            model = tiny_gpv(remat=remat, dropout=0.1)
            variables = model.init(
                jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
                jnp.asarray(batch["query_ids"]),
                jnp.asarray(batch["answer_ids"]), train=False)
            optimizer = build_optimizer(training_cfg(), 10,
                                        variables["params"])
            state = create_train_state(variables, optimizer)
            step = make_train_step(model, optimizer, LossConfig(), 0.1,
                                   mesh=mesh, donate=False)
            sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
            _, losses = step(state, sharded, jax.random.PRNGKey(1))
            return float(losses["total_loss"])

        base = run(False)
        remat = run(True)
        assert np.isfinite(remat)
        np.testing.assert_allclose(remat, base, rtol=1e-4)

    def test_frozen_detr_phase(self):
        """training.freeze=True: detr params must not move."""
        mesh = make_mesh(data=8)
        model = tiny_gpv()
        batch = make_batch(B=8)
        variables = init_vars(model)
        # warmup off: the warmup schedule gives lr=0 at step 0, which
        # would mask the regression being tested
        optimizer = build_optimizer(
            training_cfg(freeze=True, lr_warmup=False,
                         lr_linear_decay=False),
            steps_per_epoch=10, params=variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=mesh, donate=False)
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        p0 = jax.tree.map(np.asarray, state.params["detr"])
        state, _ = step(state, sharded, jax.random.PRNGKey(1))
        after = jax.tree.map(np.asarray, state.params["detr"])
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
class TestGradAccumulation:
    def test_accum_matches_single_step_with_uniform_microbatches(self):
        """grad_accum=2 over a batch whose halves have identical task
        composition == one full-batch step (reference-DDP per-shard
        normalization makes them equal when shards are homogeneous)."""
        model = tiny_gpv()
        # same task layout in both halves: [cap,vqa,cls,det] x2
        batch = make_batch(B=8)
        variables = init_vars(model)
        optimizer = build_optimizer(training_cfg(), steps_per_epoch=10,
                                    params=variables["params"])
        state1 = create_train_state(variables, optimizer)
        state2 = create_train_state(variables, optimizer)
        step1 = make_train_step(model, optimizer, LossConfig(), 0.1,
                                mesh=None, donate=False)
        step2 = make_train_step(model, optimizer, LossConfig(), 0.1,
                                mesh=None, donate=False, grad_accum=2)
        rng = jax.random.PRNGKey(1)
        # dropout rngs differ per microbatch by construction; compare with
        # dropout disabled (tiny_gpv uses dropout=0.0 already)
        s1, l1 = step1(state1, batch, rng)
        s2, l2 = step2(state2, batch, rng)
        # box losses normalize per-shard; halves carry 1 det sample each
        # with the same box count, so every loss must agree
        for k in ("loss_caption", "loss_vqa", "loss_cls", "loss_ce",
                  "loss_bbox", "loss_giou", "total_loss"):
            np.testing.assert_allclose(float(l2[k]), float(l1[k]),
                                       rtol=2e-4, atol=2e-4, err_msg=k)
        # params after the step agree too. Adam normalizes per element, so
        # where the TRUE gradient is ~0 the fp32 summation ORDER (2 halves
        # vs 1 batch) decides the sign and the update flips by up to
        # ~2*lr_t — a property of Adam, not an accumulation bug. Two
        # classes of directions have MATHEMATICALLY zero gradient by
        # softmax shift-invariance, so their "gradient" is pure noise:
        #   - key-projection biases (adding b to every key shifts each
        #     query's logits by the same q.b -> softmax unchanged)
        #   - classifier_transform bias (adds h.b uniformly across the
        #     vocab logits -> CE unchanged)
        # Those may flip by a full update; everything else must match to
        # reassociation noise, with a small allowance for genuinely-tiny
        # gradient elements.
        ZERO_GRAD_DIRS = ("k_proj/bias", "key1/bias", "key2/bias",
                          "classifier_transform/bias")
        flips = 0
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(s1.params)[0],
                jax.tree.leaves(s2.params)):
            name = "/".join(str(k.key) for k in path)
            d = np.abs(np.asarray(a) - np.asarray(b))
            if name.endswith(ZERO_GRAD_DIRS):
                assert float(d.max()) < 2.5e-3, name  # |2 * lr_t| bound
                continue
            assert float(d.max()) < 2e-4, name
            flips += int((d > 5e-5).sum())
        assert flips <= 32, f"{flips} elements beyond reassociation noise"

    def test_accum_on_mesh_runs_finite(self):
        mesh = make_mesh(data=8)
        model = tiny_gpv()
        batch = make_batch(B=16)
        variables = init_vars(model)
        optimizer = build_optimizer(training_cfg(), steps_per_epoch=10,
                                    params=variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=mesh, donate=False,
                               state_template=state, grad_accum=2)
        state, losses = step(state, shard_batch(batch, mesh),
                             jax.random.PRNGKey(2))
        assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.slow
class TestFrozenPhase:
    def test_freeze_trains_joiner_but_not_detr(self):
        """Phase-1 frozen-DETR: detr params must stay EXACTLY unchanged
        while detr_joiner updates (regression: r1 froze the whole
        'detr_head' group including the randomly-initialized joiner, which
        the reference trains — train_distr.py:136-140 freezes only loaded
        detr.* keys)."""
        model = tiny_gpv()
        batch = make_batch(B=8)
        variables = init_vars(model)
        # warmup off: the warmup schedule gives lr=0 at step 0, which
        # would mask the regression being tested
        optimizer = build_optimizer(
            training_cfg(freeze=True, lr_warmup=False,
                         lr_linear_decay=False),
            steps_per_epoch=10, params=variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=None, donate=False, freeze_detr=True)
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["total_loss"]))

        detr_delta = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params["detr"], new_state.params["detr"])
        assert max(jax.tree.leaves(detr_delta)) == 0.0, "detr moved"
        joiner_delta = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params["detr_joiner"], new_state.params["detr_joiner"])
        assert max(jax.tree.leaves(joiner_delta)) > 0.0, (
            "detr_joiner did not train in the frozen phase")
        coatt_delta = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params["co_att0"], new_state.params["co_att0"])
        assert max(jax.tree.leaves(coatt_delta)) > 0.0

    def test_partial_freeze_trains_unloaded_detr_params(self):
        """frozen_detr_paths (the keys a DETR checkpoint actually
        initialized) restricts the freeze: a detr param NOT in the set —
        e.g. class_embed when num_classes differs from the checkpoint —
        keeps training in phase 1, exactly as the reference's
        init_detr_params-based requires_grad gating
        (train_distr.py:136-140; ADVICE r2 #2)."""
        model = tiny_gpv()
        batch = make_batch(B=8)
        variables = init_vars(model)
        all_paths = {
            "/".join(str(k.key) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(
                variables["params"]["detr"])[0]}
        unloaded = {p for p in all_paths if p.startswith("class_embed")}
        assert unloaded, sorted(all_paths)[:5]
        matched = all_paths - unloaded

        optimizer = build_optimizer(
            training_cfg(freeze=True, lr_warmup=False,
                         lr_linear_decay=False),
            steps_per_epoch=10, params=variables["params"],
            frozen_detr_paths=matched)
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=None, donate=False, freeze_detr=True,
                               frozen_detr_paths=matched)
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["total_loss"]))

        deltas = {
            "/".join(str(k.key) for k in p): float(v)
            for p, v in jax.tree_util.tree_flatten_with_path(
                jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)),
                             state.params["detr"],
                             new_state.params["detr"]))[0]}
        for p in matched:
            assert deltas[p] == 0.0, f"frozen {p} moved"
        moved = [p for p in unloaded if deltas[p] > 0.0]
        assert moved, "unloaded class_embed params did not train"

    def test_frozen_grads_are_structurally_zero(self):
        """stop_gradient makes the DETR grads exact zeros (XLA eliminates
        the backward through the tower, the perf point of the change)."""
        from gpv_tpu.losses.criterion import gpv_criterion

        model = tiny_gpv()
        batch = make_batch(B=4)
        variables = init_vars(model)

        def loss_fn(params):
            p = dict(params)
            p["detr"] = jax.lax.stop_gradient(p["detr"])
            out = model.apply(
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                jnp.asarray(batch["image"], jnp.float32),
                jnp.asarray(batch["query_ids"]),
                jnp.asarray(batch["answer_ids"]),
                query_valid=jnp.asarray(batch["query_valid"]), train=False)
            total, _ = gpv_criterion(out, {
                k: jnp.asarray(v) for k, v in batch.items()}, LossConfig())
            return total

        grads = jax.grad(loss_fn)(variables["params"])
        assert all(float(jnp.max(jnp.abs(g))) == 0.0
                   for g in jax.tree.leaves(grads["detr"]))
        assert any(float(jnp.max(jnp.abs(g))) > 0.0
                   for g in jax.tree.leaves(grads["detr_joiner"]))


class TestQueryDedup:
    """Frozen-BERT query dedup (BASELINE.md r4): the collator emits the
    batch's unique query rows + gather indices; the train step encodes
    the unique rows once, outside the grad-accum scan. Must be EXACT."""

    def _dedup_fields(self, batch, bucket=4):
        """The EXACT production emission (Collator.dedup_emission), incl.
        the U-capped-at-B rule — not a re-implementation."""
        from gpv_tpu.datasets.loader import Collator
        out = dict(batch)
        out.update(Collator.dedup_emission(batch["query_ids"],
                                           batch["query_valid"], bucket))
        return out

    def test_collator_emission_roundtrip(self):
        from gpv_tpu.datasets.loader import Collator
        from gpv_tpu.text import WordPieceTokenizer
        from gpv_tpu.text.vocab import AnswerVocab

        col = Collator(AnswerVocab.debug(), WordPieceTokenizer.debug(),
                       max_text_len=8, dedup_queries=True, dedup_bucket=2)
        items = [{"task": "CocoVqa", "query": ["what is this", "show a dog",
                                               "what is this"][i % 3],
                  "answer": "cat", "image": np.zeros((4, 4, 3), np.float32)}
                 for i in range(8)]
        batch = col(items)
        assert "query_uniq_ids" in batch
        U = batch["query_uniq_ids"].shape[0]
        assert U % 2 == 0 and U < 8
        np.testing.assert_array_equal(
            batch["query_uniq_ids"][batch["query_gather"]],
            batch["query_ids"])
        np.testing.assert_array_equal(
            batch["query_uniq_valid"][batch["query_gather"]],
            batch["query_valid"])

    def test_collator_always_emits_capped_at_batch(self):
        """Emission is UNCONDITIONAL (the jit batch pytree must not toggle
        mid-epoch — each toggle is a full train-step recompile); when dedup
        can't save, U caps at B and the 'unique' rows are just the batch."""
        from gpv_tpu.datasets.loader import Collator
        from gpv_tpu.text import WordPieceTokenizer
        from gpv_tpu.text.vocab import AnswerVocab

        col = Collator(AnswerVocab.debug(), WordPieceTokenizer.debug(),
                       max_text_len=8, dedup_queries=True, dedup_bucket=16)
        items = [{"task": "CocoVqa", "query": f"question number {i}",
                  "answer": "cat", "image": np.zeros((4, 4, 3), np.float32)}
                 for i in range(8)]  # all unique; bucket 16 > B=8
        batch = col(items)
        assert batch["query_uniq_ids"].shape[0] == 8  # U == B cap
        np.testing.assert_array_equal(
            batch["query_uniq_ids"][batch["query_gather"]],
            batch["query_ids"])

    @pytest.mark.parametrize("grad_accum", [1, 2])
    def test_train_step_losses_match_plain(self, grad_accum):
        model = tiny_gpv()
        batch = make_batch(B=8)
        # make rows actually repeat (3 distinct query rows across 8)
        batch["query_ids"] = batch["query_ids"][
            np.asarray([0, 1, 2, 0, 1, 2, 0, 1])]
        variables = init_vars(model)
        optimizer = build_optimizer(training_cfg(), 10, variables["params"])

        def run(b):
            state = create_train_state(variables, optimizer)
            step = make_train_step(model, optimizer, LossConfig(), 0.1,
                                   donate=False, grad_accum=grad_accum)
            state, losses = step(state, jax.tree.map(jnp.asarray, b),
                                 jax.random.PRNGKey(3))
            return state, {k: float(v) for k, v in losses.items()}

        state_p, plain = run(batch)
        state_d, dedup = run(self._dedup_fields(batch))
        for k in plain:
            np.testing.assert_allclose(dedup[k], plain[k], rtol=2e-5,
                                       atol=1e-6, err_msg=k)
        # parameters after the step agree too (same gradients)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(state_p.params),
                jax.tree_util.tree_leaves_with_path(state_d.params)):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
class TestMemorization:
    """Training on one fixed batch reaches MEMORIZATION, not just a loss dip.

    `test_loss_decreases_over_steps` shows the gradient points downhill; this
    shows the whole loop CONVERGES to correct behavior: after overfitting,
    greedy decode reproduces every supervised answer token-for-token and the
    Hungarian-matched box L1 collapses. It is the one test where the
    optimizer, criterion, matcher, encoder, and KV-cached decoder must all
    fit together end to end — the same fixed-point the reference's training
    recipe relies on (exp/gpv/train_distr.py:399-471: same criterion,
    same decode at eval time)."""

    def test_overfit_fixed_batch(self):
        from gpv_tpu.decode import greedy_decode
        from gpv_tpu.models.gpv import GPV

        model = tiny_gpv()
        B, S, CLS = 8, 8, 1
        batch = make_batch(B=B, seed=7)
        # deterministic, per-row-distinct 4-token targets (positions 1..4);
        # det rows (i % 4 == 3) carry no answer supervision
        ans = np.zeros((B, S), np.int32)
        ans[:, 0] = CLS
        for i in range(B):
            ans[i, 1:5] = [(3 * i + 7) % VOCAB, (5 * i + 11) % VOCAB,
                           (7 * i + 13) % VOCAB, 2]
        batch["answer_ids"] = ans
        batch["answer_lens"] = np.full((B,), 5, np.int32)

        variables = init_vars(model)
        nonparam = {k: v for k, v in variables.items() if k != "params"}
        # constant lr=1e-3 + clip 0.1: measured to memorize this batch at
        # step ~180 (3e-3 diverges to NaN on the tiny model)
        cfg = training_cfg(lr=1e-3, lr_backbone=1e-3, weight_decay=0.0,
                           lr_warmup=False, lr_linear_decay=False,
                           lr_milestones=[10 ** 6])
        optimizer = build_optimizer(cfg, steps_per_epoch=1000,
                                    params=variables["params"])
        state = create_train_state(variables, optimizer)
        step = make_train_step(model, optimizer, LossConfig(),
                               clip_max_norm=0.1, donate=False)
        jbatch = jax.tree.map(jnp.asarray, batch)
        imgs, qids = jbatch["image"], jbatch["query_ids"]

        @jax.jit
        def decode_fn(params):
            v = {"params": params, **nonparam}
            memory, mem_valid, _ = model.apply(v, imgs, qids,
                                               method=GPV.encode)
            tokens, _ = greedy_decode(model, v, memory, mem_valid, CLS)
            return tokens

        tgt = ans[:, 1:5]
        has_answer = batch["has_answer"]
        first_loss = None
        memorized = False
        for i in range(1, 281):
            state, losses = step(state, jbatch, jax.random.PRNGKey(i))
            if first_loss is None:
                first_loss = float(losses["total_loss"])
            if i % 20 == 0:
                toks = np.asarray(decode_fn(state.params))[:, :4]
                if (toks[has_answer] == tgt[has_answer]).all() \
                        and float(losses["loss_bbox"]) < 0.05:
                    memorized = True
                    break
        assert memorized, (
            f"no memorization after {i} steps: decoded\n"
            f"{np.asarray(decode_fn(state.params))[:, :4]}\nwant\n{tgt}\n"
            f"loss_bbox={float(losses['loss_bbox']):.4f}")
        # the fit is substantial, not a masked-out degenerate optimum
        assert float(losses["total_loss"]) < 0.25 * first_loss, \
            (first_loss, float(losses["total_loss"]))
