"""TRAINING-STEP parity vs the ACTUAL reference (VERDICT r4 next #1).

Every prior parity proof is forward-only; this suite drives the reference
`GPV` (`/root/reference/exp/gpv/models/gpv.py`) through FULL torch training
steps — the exact recipe of `exp/gpv/train_distr.py`:
  - AdamW over the 4 substring-matched param groups with backbone lr
    (`train_distr.py:228-254`),
  - `clip_grad_norm_` over params['detr_backbone']+params['detr_head'] ONLY
    at clip_max_norm 0.1 (`:423-426`),
  - `WarmupLinearSchedule` stepped per iteration with the LambdaLR
    constructor-step offset and FRACTIONAL warmup_steps (`:287-305,469`),
  - losses computed inside `GPV.forward` (`gpv.py:202-206`),
from converter-shared weights and fixed data, then runs the SAME steps
through the production `build_optimizer` + `make_train_step` and asserts
per-step total_loss, the per-group LR trajectory, and the updated parameter
tensors match.

Reduced image size (160x224) and vocab (1k) keep CPU time sane; the
param-group / clip-set / schedule / AdamW semantics under test are
dims-independent. All dropout rates are zeroed on both sides so train-mode
forward is deterministic (dropout masks are RNG-framework-specific and
cannot be matched; rate-0 keeps every other train-mode semantic live).
Model composition itself is covered at released dims by
tests/test_reference_gpv_e2e.py.
"""
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import _torchvision_stub  # noqa: E402,F401
from test_reference_source import sd_np  # noqa: E402
from test_reference_gpv_e2e import (_StubBert, _StubTokenizer,  # noqa: E402
                                    _released_cfg, _randomize_frozen_bn)

REF = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference repo not mounted")]

FV = 1000
H, W, B = 160, 224, 4
STEPS = 4
TOTAL_STEPS = 5          # t_total: > STEPS so the last update has lr > 0
LR, LR_BACKBONE, WD = 1e-4, 1e-5, 1e-4
WARMUP_FRACTION = 0.3    # warmup_steps = 1.5: fractional, crossed mid-run
CLIP = 0.1


@pytest.fixture(autouse=True, scope="module")
def _cpu_cuda_noop():
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig


@pytest.fixture(autouse=True, scope="module")
def _treebank_word_tokenize():
    """nltk.word_tokenize needs the punkt corpus (absent in this image) only
    for SENTENCE splitting; on the single-sentence answers used here it is
    exactly TreebankWordTokenizer().tokenize, so patch that into the
    reference module (gpv.py:16,408)."""
    from nltk.tokenize.treebank import TreebankWordTokenizer

    from exp.gpv.models import gpv as ref_gpv_mod
    orig = ref_gpv_mod.word_tokenize
    ref_gpv_mod.word_tokenize = TreebankWordTokenizer().tokenize
    yield
    ref_gpv_mod.word_tokenize = orig


class _ZeroDropoutBert(_StubBert):
    """_StubBert with dropout-free BertConfig: the reference trains with
    model.train() so HF BertConfig's default 0.1 dropouts would make the
    (frozen, no_grad) BERT forward stochastic — unmatchable across
    frameworks. Zeroing them keeps every deterministic semantic live."""

    def __init__(self, cfg=None):
        torch.nn.Module.__init__(self)
        from transformers import BertConfig, BertModel
        self.tokenizer = _StubTokenizer()
        self.model = BertModel(BertConfig(hidden_dropout_prob=0.0,
                                          attention_probs_dropout_prob=0.0))


def _zero_dropout(cfg):
    cfg.detr.dropout = 0.0
    for k in ("attention_probs_dropout_prob", "hidden_dropout_prob",
              "v_attention_probs_dropout_prob", "v_hidden_dropout_prob"):
        setattr(cfg.co_att, k, 0.0)
    cfg.text_decoder.dropout = 0.0
    return cfg


def _build_ref(tmp_path, seed=300):
    import json

    from exp.gpv.models import gpv as ref_gpv_mod

    from gpv_tpu.text.vocab import SPECIAL_TOKENS

    words = [f"w{i:05d}" for i in range(FV - 4)] + list(SPECIAL_TOKENS)
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps(words))
    embed_path = tmp_path / "vocab_embed.npy"
    np.save(embed_path,
            0.1 * np.random.RandomState(seed).randn(FV, 768)
            .astype(np.float32))

    torch.manual_seed(seed)
    orig_bert = ref_gpv_mod.Bert
    ref_gpv_mod.Bert = _ZeroDropoutBert
    try:
        ref = ref_gpv_mod.GPV(
            _zero_dropout(_released_cfg(vocab_path, embed_path)))
    finally:
        ref_gpv_mod.Bert = orig_bert
    _randomize_frozen_bn(ref, seed + 1)
    return ref


def _ref_param_groups(model):
    """The reference's substring param grouping (train_distr.py:228-243)."""
    params = {"detr_backbone": [], "detr_head": [], "bert": [], "others": []}
    for n, p in model.named_parameters():
        if "detr.backbone" in n:
            params["detr_backbone"].append(p)
        elif "detr" in n:
            params["detr_head"].append(p)
        elif "bert." in n:
            params["bert"].append(p)
        else:
            params["others"].append(p)
    return params


def _ref_optim(model):
    """AdamW + MultiStepLR + WarmupLinearSchedule exactly as the reference
    constructs them at a fresh start (train_distr.py:247-305): MultiStepLR
    first (last_epoch=-1, sets initial_lr), then the warmup LambdaLR with
    last_epoch=step=0 — whose constructor-step makes update n use
    lr_lambda(n+1)."""
    groups = _ref_param_groups(model)
    optimizer = torch.optim.AdamW([
        {"params": groups["detr_backbone"], "lr": LR_BACKBONE},
        {"params": groups["detr_head"]},
        {"params": groups["bert"]},
        {"params": groups["others"]}],
        lr=LR, weight_decay=WD)
    torch.optim.lr_scheduler.MultiStepLR(optimizer, [100], 0.1,
                                         last_epoch=-1)
    warmup_steps = WARMUP_FRACTION * TOTAL_STEPS  # fractional, like upstream

    def lr_lambda(step):  # pytorch_transformers WarmupLinearSchedule
        if step < warmup_steps:
            return float(step) / float(max(1, warmup_steps))
        return max(0.0, float(TOTAL_STEPS - step)
                   / float(max(1.0, TOTAL_STEPS - warmup_steps)))

    warmup = torch.optim.lr_scheduler.LambdaLR(optimizer, lr_lambda,
                                               last_epoch=0)
    return optimizer, warmup, groups


def _make_data():
    """Fixed mixed-task batch: cap / vqa / det / cls."""
    from utils.detr_misc import nested_tensor_from_tensor_list

    g = torch.Generator().manual_seed(310)
    imgs = [torch.randn(3, H, W, generator=g) for _ in range(B)]
    samples = nested_tensor_from_tensor_list(imgs)
    queries = ["describe the image", "how many w00007",
               "locate the w00011", "what is this thing called"]
    tasks = ["CocoCaptioning", "CocoVqa", "CocoDetection",
             "CocoClassification"]
    answers = ["w00001 w00002 w00003 w00004", "w00005", "", "w00009"]
    det_boxes = torch.tensor([[0.35, 0.4, 0.2, 0.25],
                              [0.6, 0.55, 0.15, 0.3],
                              [0.5, 0.5, 0.4, 0.35]])
    targets = []
    for i, task in enumerate(tasks):
        t = {"task": task}
        if task == "CocoDetection":
            t["boxes"] = det_boxes.clone()
            t["labels"] = torch.zeros(det_boxes.shape[0], dtype=torch.long)
        else:
            t["answer"] = answers[i]
        targets.append(t)
    return samples, queries, tasks, answers, targets, det_boxes


def _jax_batch(ref, samples, queries, tasks, targets, det_boxes):
    from gpv_tpu.losses import TASK_IDS

    answer_tokens, answer_ids_t = ref.encode_answers(targets)
    answer_lens = [len([w for w in toks if w != "__pad__"])
                   for toks in answer_tokens]
    tok = _StubTokenizer()(queries)
    M = det_boxes.shape[0]
    boxes = np.zeros((B, M, 4), np.float32)
    box_valid = np.zeros((B, M), bool)
    det_i = tasks.index("CocoDetection")
    boxes[det_i] = det_boxes.numpy()
    box_valid[det_i] = True
    batch = {
        "image": jnp.asarray(samples.tensors.permute(0, 2, 3, 1).numpy()),
        "image_valid": jnp.asarray(~samples.mask.numpy()),
        "query_ids": jnp.asarray(tok["input_ids"].numpy()),
        "query_valid": jnp.asarray(
            tok["attention_mask"].numpy().astype(bool)),
        "answer_ids": jnp.asarray(answer_ids_t.numpy().astype(np.int32)),
        "answer_lens": jnp.asarray(answer_lens, jnp.int32),
        "task_id": jnp.asarray([TASK_IDS[t] for t in tasks], jnp.int32),
        "has_answer": jnp.asarray([t != "CocoDetection" for t in tasks]),
        "boxes": jnp.asarray(boxes),
        "box_labels": jnp.zeros((B, M), jnp.int32),
        "box_valid": jnp.asarray(box_valid),
        "has_boxes": jnp.asarray([t == "CocoDetection" for t in tasks]),
    }
    return batch, answer_ids_t


def _run_torch_steps(ref, samples, queries, targets, n_steps,
                     freeze=False):
    """The reference hot loop (train_distr.py:399-471), returning per-step
    (loss, group lrs), the pre-clip detr grad norm of step 0, and the raw
    step-0 gradients (pre-clip) keyed by torch param name."""
    optimizer, warmup, groups = _ref_optim(ref)
    if freeze:
        # freeze_detr_params with init_detr_params = every detr.* key (the
        # common all-keys-matched case, train_distr.py:136-140,522-525)
        for n, p in ref.named_parameters():
            if n.startswith("detr."):
                p.requires_grad = False
    losses, lrs, preclip_norm0, grads0 = [], [], None, None
    for n in range(n_steps):
        lrs.append([g["lr"] for g in optimizer.param_groups])
        ref.train()
        answer_tokens, answer_token_ids = ref.encode_answers(targets)
        for i, t in enumerate(targets):
            t["answer_token_ids"] = answer_token_ids[i, 1:]
        total_loss = ref(samples, queries, answer_token_ids, targets)
        optimizer.zero_grad()
        total_loss.backward()
        clip_params = groups["detr_backbone"] + groups["detr_head"]
        if n == 0:
            preclip_norm0 = float(torch.norm(torch.stack([
                p.grad.norm() for p in clip_params
                if p.grad is not None])))
            grads0 = {name: p.grad.detach().numpy().copy()
                      for name, p in ref.named_parameters()
                      if p.grad is not None}
        torch.nn.utils.clip_grad_norm_(clip_params, CLIP)
        optimizer.step()
        warmup.step()
        losses.append(float(total_loss))
    return losses, lrs, preclip_norm0, grads0


def _convert_grads(ref, grads_by_torch_name):
    """Route torch gradients through the PRODUCTION weight converter so
    they land under our param-tree names (every converter weight transform
    is a transpose/reshape, which maps gradients identically); params
    without grads (requires_grad=False / unused) convert as zeros."""
    full = {k: np.zeros_like(v) for k, v in sd_np(ref).items()}
    for k, g in grads_by_torch_name.items():
        full[k] = np.asarray(g, np.float32)
    from gpv_tpu.train.checkpoint import convert_gpv_torch
    return convert_gpv_torch(full)["params"]


def _our_grads0(model, variables, batch):
    """Step-0 gradients through the production loss path: mirrors
    make_train_step's loss_fn (models/.../parallel/train_step.py:70-108)
    minus the uint8 branch (this batch ships fp32 pixels, same raw values
    the torch side sees)."""
    from gpv_tpu.losses import LossConfig
    from gpv_tpu.losses.criterion import gpv_criterion
    from gpv_tpu.train import param_group as pg

    def loss_fn(params):
        params = dict(params)
        params["detr"] = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.lax.stop_gradient(x)
            if pg(("detr",) + tuple(k.key for k in p)) == "frozen" else x,
            params["detr"])
        outputs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["image"], batch["query_ids"], batch["answer_ids"],
            image_valid=batch.get("image_valid"),
            query_valid=batch["query_valid"], train=True,
            rngs={"dropout": jax.random.PRNGKey(0)})
        total, _ = gpv_criterion(outputs, batch, LossConfig())
        return total

    return jax.jit(jax.grad(loss_fn))(variables["params"])


def _flat(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out["/".join(k.key for k in path)] = np.asarray(leaf, np.float64)
    return out


def param_group_of(name: str) -> str:
    from gpv_tpu.train import param_group
    return param_group(tuple(name.split("/")))


def _zero_grad_leaf(name):
    """Leaves whose gradient is MATHEMATICALLY zero. Both frameworks see
    only fp32 round-off there, and Adam normalizes that noise to a full
    lr-sized step in an arbitrary (framework-specific) direction, so update
    DIRECTION is meaningless — only boundedness is asserted.

      - attention key-projection biases (k_proj/key1/key2): softmax scores
        are shift-invariant in the key bias (q . b_k is constant over the
        softmax axis);
      - classifier_transform/bias: answer logits are
        answer_embed @ (W v + b)^T and softmax-CE logit-grads sum to zero
        over the vocab axis — the only axis b reaches.
    """
    return (name.endswith("k_proj/bias")
            or name.endswith("key1/bias") or name.endswith("key2/bias")
            or name.endswith("classifier_transform/bias"))


class TestTrainingStepParity:
    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        from gpv_tpu.losses import LossConfig
        from gpv_tpu.models.gpv import GPV as FlaxGPV
        from gpv_tpu.parallel import create_train_state, make_train_step
        from gpv_tpu.train import build_optimizer
        from gpv_tpu.train.checkpoint import convert_gpv_torch
        from test_train import training_cfg

        tmp = tmp_path_factory.mktemp("train_parity")
        ref = _build_ref(tmp)
        samples, queries, tasks, answers, targets, det_boxes = _make_data()
        variables = convert_gpv_torch(sd_np(ref))
        params_before = _flat(variables["params"])
        batch, _ = _jax_batch(ref, samples, queries, tasks, targets,
                              det_boxes)

        # ---- our side: production optimizer + train step ----
        model = FlaxGPV(vocab_size=FV, mask_query_pads=False, dropout=0.0,
                        detr_cfg={"dropout": 0.0})
        cfg = training_cfg(num_epochs=1, lr=LR, lr_backbone=LR_BACKBONE,
                           weight_decay=WD, lr_warmup=True,
                           lr_linear_decay=True,
                           lr_warmup_fraction=WARMUP_FRACTION,
                           clip_max_norm=CLIP)
        optimizer = build_optimizer(cfg, steps_per_epoch=TOTAL_STEPS,
                                    params=variables["params"])
        step_fn = make_train_step(model, optimizer, LossConfig(),
                                  clip_max_norm=CLIP, donate=False)
        state = create_train_state(variables, optimizer)
        ours_losses = []
        rng = jax.random.PRNGKey(0)
        for _ in range(STEPS):
            state, losses = step_fn(state, batch, rng)
            ours_losses.append(float(losses["total_loss"]))

        # ---- torch side: the reference recipe ----
        ref_losses, ref_lrs, preclip_norm0, grads0 = _run_torch_steps(
            ref, samples, queries, targets, STEPS)
        params_after_ref = _flat(convert_gpv_torch(sd_np(ref))["params"])

        return dict(ours_losses=ours_losses, ref_losses=ref_losses,
                    ref_lrs=ref_lrs, preclip_norm0=preclip_norm0,
                    params_before=params_before,
                    params_after_ref=params_after_ref,
                    params_after_ours=_flat(state.params),
                    grads_ref=_flat(_convert_grads(ref, grads0)),
                    grads_ours=_flat(_our_grads0(model, variables, batch)))

    def test_lr_trajectory_matches_torch(self, run):
        """Per-update LR of every group == our optax schedule, exactly —
        pins the LambdaLR constructor-step (+1) and fractional warmup."""
        from gpv_tpu.train import warmup_linear_schedule
        s_head = warmup_linear_schedule(LR, TOTAL_STEPS, WARMUP_FRACTION)
        s_bb = warmup_linear_schedule(LR_BACKBONE, TOTAL_STEPS,
                                      WARMUP_FRACTION)
        for n, lrs in enumerate(run["ref_lrs"]):
            np.testing.assert_allclose(lrs[0], float(s_bb(n)), rtol=1e-6,
                                       err_msg=f"backbone lr at update {n}")
            for gi in (1, 2, 3):
                np.testing.assert_allclose(
                    lrs[gi], float(s_head(n)), rtol=1e-6,
                    err_msg=f"group {gi} lr at update {n}")

    def test_clip_is_active(self, run):
        """The 0.1 clip must actually bite for the parity to exercise it."""
        assert run["preclip_norm0"] > CLIP * 3, run["preclip_norm0"]

    def test_step0_gradients(self, run):
        """Raw dL/dtheta parity per leaf at step 0 — the SHARP assert: a
        wrong freeze set, a missing stop_gradient (e.g. the RoI box-coord
        path torchvision never differentiates), or a LayerNorm-eps
        mismatch shows up here at full strength, before Adam's per-element
        normalization can amplify fp32 noise into direction differences.
        Leaves whose reference grad norm sits at the noise floor (<1e-3:
        mathematically-zero k-biases, near-dead co-attention streams) are
        compared for boundedness only."""
        gr, go = run["grads_ref"], run["grads_ours"]
        assert set(gr) == set(go)
        worst = []
        for name in sorted(gr):
            a, b = gr[name], go[name]
            na = float(np.linalg.norm(a))
            nb = float(np.linalg.norm(b))
            if param_group_of(name) == "frozen":
                assert na == 0.0 and nb == 0.0, (name, na, nb)
                continue
            if na < 1e-3:
                assert nb < max(1e-3, 10 * na) + 1e-6, (name, na, nb)
                continue
            rel = float(np.linalg.norm(a - b)) / na
            worst.append((rel, name))
            assert rel < 0.06, f"{name}: grad rel err {rel:.4f} (|g|={na:.3e})"
        worst.sort(reverse=True)
        print("\n[train parity] worst step-0 grad rel errors:")
        for r, n in worst[:8]:
            print(f"  {r:.5f}  {n}")

    def test_per_step_losses(self, run):
        print(f"\n[train parity] ours={run['ours_losses']}\n"
              f"               ref ={run['ref_losses']}")
        for n, (a, b) in enumerate(zip(run["ours_losses"],
                                       run["ref_losses"])):
            np.testing.assert_allclose(
                a, b, rtol=5e-4,
                err_msg=f"total_loss diverged at step {n}")

    def test_params_after_steps(self, run):
        """COARSE guard on the 4-step trajectories. The SHARP asserts live
        in test_step0_gradients (raw dL/dtheta, <=6% per leaf) and
        TestOptimizerSemanticsParity (bit-level AdamW/clip/schedule on
        noise-free synthetic grads): after Adam's per-element
        normalization, the few-percent fp32 forward noise flips the
        update direction of low-SNR elements, so per-leaf trajectory
        ratios are NOT a parity signal — only frozen/stationary
        exactness, boundedness, and the absence of O(1) displacement are.
        """
        from gpv_tpu.train import param_group
        before = run["params_before"]
        after_ref = run["params_after_ref"]
        after_ours = run["params_after_ours"]
        assert set(after_ours) == set(after_ref)
        worst, sq_diff, sq_upd = [], 0.0, 0.0
        for name in sorted(after_ref):
            group = param_group(tuple(name.split("/")))
            upd = np.abs(after_ref[name] - before[name])
            diff = np.abs(after_ours[name] - after_ref[name])
            if group == "frozen":
                assert float(upd.max()) == 0.0, f"torch updated {name}"
                assert float(diff.max()) == 0.0, f"we updated {name}"
                continue
            lr_g = LR_BACKBONE if group == "detr_backbone" else LR
            if float(upd.max()) == 0.0:
                # exactly-zero-grad leaf (decoder layer0 self_attn v/out
                # kernels: their input is the all-zeros tgt): the wd-only
                # AdamW update (~lr*wd*p ≈ 1e-8 relative) is below one
                # fp32 ulp on BOTH frameworks — bitwise stationary on both
                # sides IS the parity
                assert float(diff.max()) == 0.0, (
                    f"{name}: torch stationary, ours moved {diff.max():.3e}")
                continue
            # per-element Adam steps are bounded by ~lr
            assert float(diff.max()) < 4 * STEPS * lr_g, (
                f"{name} ({group}): max diff {diff.max():.3e}")
            sq_diff += float((diff ** 2).sum())
            sq_upd += float((upd ** 2).sum())
            if _zero_grad_leaf(name):
                continue  # boundedness only — see _zero_grad_leaf
            if float(upd.mean()) < 1e-9:
                # near-stationary leaf: the reference update is fp32
                # round-off (e.g. decoder layer0 self-attn q/k kernels,
                # whose grad is second-order through the zero-init value
                # bias — ~1e-16 after STEPS steps, vs ~lr for live
                # leaves). Ratio of round-off to round-off is not a
                # parity signal; boundedness above already covers it.
                continue
            mean_ratio = float(diff.mean()) / (float(upd.mean()) + 1e-30)
            worst.append((mean_ratio, name, group))
            # catastrophic-only per leaf: a wrong group/lr/clip/schedule
            # displaces by O(1) of the update
            assert mean_ratio < 1.0, (
                f"{name} ({group}): mean|ours-ref|={diff.mean():.3e} is "
                f"{mean_ratio:.3f} of mean update {upd.mean():.3e}")
        global_ratio = math.sqrt(sq_diff / sq_upd)
        worst.sort(reverse=True)
        print(f"\n[train parity] global |ours-ref|/|update| = "
              f"{global_ratio:.4f}; worst per-leaf ratios:")
        for r, n, g in worst[:8]:
            print(f"  {r:.4f}  {n} ({g})")
        assert global_ratio < 0.5, global_ratio


class TestFreezePhaseParity:
    """Phase-1 frozen-DETR semantics (training.freeze): the reference sets
    requires_grad=False on init_detr_params (train_distr.py:136-140) — detr
    backbone+head stop updating, the clip reduces to the joiner-only grads,
    everything else keeps training. Ours: stop_gradient + set_to_zero."""

    def test_two_frozen_steps(self, tmp_path):
        from gpv_tpu.losses import LossConfig
        from gpv_tpu.models.gpv import GPV as FlaxGPV
        from gpv_tpu.parallel import create_train_state, make_train_step
        from gpv_tpu.train import build_optimizer, param_group
        from gpv_tpu.train.checkpoint import convert_gpv_torch
        from test_train import training_cfg

        n_steps = 2
        ref = _build_ref(tmp_path, seed=330)
        samples, queries, tasks, answers, targets, det_boxes = _make_data()
        variables = convert_gpv_torch(sd_np(ref))
        before = _flat(variables["params"])
        batch, _ = _jax_batch(ref, samples, queries, tasks, targets,
                              det_boxes)

        model = FlaxGPV(vocab_size=FV, mask_query_pads=False, dropout=0.0,
                        detr_cfg={"dropout": 0.0})
        cfg = training_cfg(num_epochs=1, lr=LR, lr_backbone=LR_BACKBONE,
                           weight_decay=WD, lr_warmup=True,
                           lr_linear_decay=True,
                           lr_warmup_fraction=WARMUP_FRACTION,
                           clip_max_norm=CLIP, freeze=True)
        optimizer = build_optimizer(cfg, steps_per_epoch=TOTAL_STEPS,
                                    params=variables["params"])
        step_fn = make_train_step(model, optimizer, LossConfig(),
                                  clip_max_norm=CLIP, donate=False,
                                  freeze_detr=True)
        state = create_train_state(variables, optimizer)
        ours_losses = []
        rng = jax.random.PRNGKey(0)
        for _ in range(n_steps):
            state, losses = step_fn(state, batch, rng)
            ours_losses.append(float(losses["total_loss"]))

        ref_losses, _, _, _ = _run_torch_steps(ref, samples, queries,
                                               targets, n_steps, freeze=True)
        after_ref = _flat(convert_gpv_torch(sd_np(ref))["params"])
        after_ours = _flat(state.params)

        for n, (a, b) in enumerate(zip(ours_losses, ref_losses)):
            np.testing.assert_allclose(a, b, rtol=5e-4,
                                       err_msg=f"frozen step {n}")
        for name in sorted(after_ref):
            group = param_group(tuple(name.split("/")))
            upd = np.abs(after_ref[name] - before[name])
            diff = np.abs(after_ours[name] - after_ref[name])
            if group in ("frozen", "detr_backbone", "detr_head"):
                assert float(upd.max()) == 0.0, f"torch updated {name}"
                assert float(diff.max()) == 0.0, f"we updated {name}"
            else:  # detr_joiner + others keep training in phase 1
                if float(upd.max()) == 0.0:  # sub-ulp wd-only leaf
                    assert float(diff.max()) == 0.0, name
                    continue
                assert float(diff.max()) < 4 * n_steps * LR, (
                    f"{name}: max diff {diff.max():.3e}")
                if _zero_grad_leaf(name):
                    continue
                mean_ratio = (float(diff.mean())
                              / (float(upd.mean()) + 1e-30))
                # same coarse guard as test_params_after_steps (Adam
                # amplifies fp32 grad noise on low-SNR elements)
                assert (mean_ratio < 0.35
                        or float(diff.mean()) < 0.05 * LR), (
                    f"{name}: {mean_ratio:.3f}")


class TestOptimizerSemanticsParity:
    """BIT-LEVEL optimizer wiring parity on NOISE-FREE synthetic gradients.

    The e2e trajectory tests above carry fp32 forward noise that Adam
    amplifies; this one removes the network entirely: a GPV-shaped param
    tree gets the SAME hand-made gradients on both sides for 6 steps
    (crossing the fractional warmup boundary AND both sides of the 0.1
    clip threshold), torch running the literal reference recipe
    (train_distr.py:228-318,420-427) and ours running the production
    `build_optimizer` + `clip_detr_grads`. Any divergence in AdamW
    eps/wd placement, group lr assignment, the clip SET, the clip norm,
    or the schedule off-by-one shows up at full scale with zero noise.
    """

    # (torch reference param name, our tree path): one leaf per semantic
    # class. requires_grad=False entries mirror upstream (stem/vocab);
    # grad=None entries mirror never-in-graph params (bert under no_grad,
    # vision_token unused).
    LEAVES = [
        ("detr.backbone.0.body.layer2.0.conv1.weight",
         ("detr", "backbone", "layer2", "block0", "conv1", "kernel"),
         dict(shape=(6, 5), frozen=False, grads=True)),
        ("detr.backbone.0.body.conv1.weight",
         ("detr", "backbone", "conv1", "kernel"),
         dict(shape=(4, 3), frozen=True, grads=False)),
        ("detr.transformer.encoder.w",
         ("detr", "transformer", "encoder", "w"),
         dict(shape=(7, 4), frozen=False, grads=True)),
        ("detr_joiner.weight", ("detr_joiner", "kernel"),
         dict(shape=(5, 5), frozen=False, grads=True)),
        ("bert.model.encoder.w", ("bert", "encoder", "w"),
         dict(shape=(3, 8), frozen=False, grads=False)),
        ("answer_head.vocab_embed", ("vocab_embed",),
         dict(shape=(9, 4), frozen=True, grads=False)),
        ("vision_token", ("vision_token",),
         dict(shape=(6,), frozen=False, grads=False)),
        ("co_att_transformer.0.dense.weight", ("co_att0", "dense", "kernel"),
         dict(shape=(4, 6), frozen=False, grads=True)),
    ]
    N_STEPS = 6
    T_TOTAL = 8  # > N_STEPS so lr stays > 0

    def _grads_for_step(self, rng, step, spec):
        # scale crosses the 0.1 clip threshold: steps 0-2 big (clip
        # active), 3-5 tiny (clip inactive) — both branches exercised
        scale = 1.0 if step < 3 else 1e-3
        return (scale * rng.randn(*spec["shape"])).astype(np.float32)

    def test_six_steps_bitwise(self):
        import optax

        from gpv_tpu.train import build_optimizer, clip_detr_grads
        from test_train import training_cfg

        rng = np.random.RandomState(99)
        init = {tn: rng.randn(*spec["shape"]).astype(np.float32)
                for tn, _, spec in self.LEAVES}
        grads_per_step = [
            {tn: self._grads_for_step(np.random.RandomState(1000 + 17 * s
                                                            + i), s, spec)
             for i, (tn, _, spec) in enumerate(self.LEAVES)}
            for s in range(self.N_STEPS)]

        # ---- torch: the literal reference construction ----
        params_t = {}
        for tn, _, spec in self.LEAVES:
            p = torch.nn.Parameter(torch.from_numpy(init[tn].copy()),
                                   requires_grad=not spec["frozen"])
            params_t[tn] = p
        groups = {"detr_backbone": [], "detr_head": [], "bert": [],
                  "others": []}
        for tn, p in params_t.items():  # train_distr.py:228-243 verbatim
            if "detr.backbone" in tn:
                groups["detr_backbone"].append(p)
            elif "detr" in tn:
                groups["detr_head"].append(p)
            elif "bert." in tn:
                groups["bert"].append(p)
            else:
                groups["others"].append(p)
        optimizer = torch.optim.AdamW([
            {"params": groups["detr_backbone"], "lr": LR_BACKBONE},
            {"params": groups["detr_head"]},
            {"params": groups["bert"]},
            {"params": groups["others"]}], lr=LR, weight_decay=WD)
        torch.optim.lr_scheduler.MultiStepLR(optimizer, [100], 0.1,
                                             last_epoch=-1)
        warmup_steps = WARMUP_FRACTION * self.T_TOTAL

        def lr_lambda(step):
            if step < warmup_steps:
                return float(step) / float(max(1, warmup_steps))
            return max(0.0, float(self.T_TOTAL - step)
                       / float(max(1.0, self.T_TOTAL - warmup_steps)))

        warmup = torch.optim.lr_scheduler.LambdaLR(optimizer, lr_lambda,
                                                   last_epoch=0)
        clip_params = groups["detr_backbone"] + groups["detr_head"]
        torch_traj = []
        for s in range(self.N_STEPS):
            optimizer.zero_grad(set_to_none=True)
            for tn, p, spec in [(t, params_t[t], sp)
                                for t, _, sp in self.LEAVES]:
                if spec["grads"]:
                    p.grad = torch.from_numpy(grads_per_step[s][tn].copy())
            torch.nn.utils.clip_grad_norm_(clip_params, CLIP)
            optimizer.step()
            warmup.step()
            torch_traj.append({tn: p.detach().numpy().copy()
                               for tn, p in params_t.items()})

        # ---- ours: production build_optimizer + clip ----
        def tree_set(tree, path, leaf):
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = leaf

        params_j = {}
        for tn, path, spec in self.LEAVES:
            tree_set(params_j, path, jnp.asarray(init[tn]))
        cfg = training_cfg(num_epochs=1, lr=LR, lr_backbone=LR_BACKBONE,
                           weight_decay=WD, lr_warmup=True,
                           lr_linear_decay=True,
                           lr_warmup_fraction=WARMUP_FRACTION,
                           clip_max_norm=CLIP)
        opt = build_optimizer(cfg, steps_per_epoch=self.T_TOTAL,
                              params=params_j)
        opt_state = opt.init(params_j)
        for s in range(self.N_STEPS):
            grads = jax.tree.map(jnp.zeros_like, params_j)
            for tn, path, spec in self.LEAVES:
                if spec["grads"]:
                    tree_set(grads, path,
                             jnp.asarray(grads_per_step[s][tn]))
            grads = clip_detr_grads(grads, CLIP)
            updates, opt_state = opt.update(grads, opt_state, params_j)
            params_j = optax.apply_updates(params_j, updates)

            flat = _flat(params_j)
            for tn, path, spec in self.LEAVES:
                ours = flat["/".join(path)]
                want = torch_traj[s][tn]
                if not spec["grads"]:
                    # torch: grad None -> AdamW skips entirely (no wd);
                    # ours: frozen/set_to_zero label -> bitwise untouched
                    np.testing.assert_array_equal(
                        ours, init[tn], err_msg=f"step {s}: {tn} moved")
                np.testing.assert_allclose(
                    ours, want, rtol=2e-6, atol=2e-7,
                    err_msg=f"step {s}: {tn} ({'/'.join(path)})")
