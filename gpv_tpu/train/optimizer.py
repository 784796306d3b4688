"""Optimizer: 4-group AdamW + warmup-linear schedule (optax).

Behavior spec: reference `exp/gpv/train_distr.py:228-253` — AdamW groups
  detr_backbone (lr_backbone 1e-5) / detr_head (lr) / bert (lr, but grad-less
  => never updated) / others (lr), weight_decay 1e-4;
`WarmupLinearSchedule` per-iteration (`:293-305`): linear 0->1 over
`warmup_fraction * total_steps` then linear 1->0 at total_steps (the epoch
MultiStepLR is clobbered per-iteration by the LambdaLR-style warmup scheduler,
so the effective schedule IS warmup-linear; the multistep path applies when
lr_warmup/linear_decay are off). Gradient clipping (0.1) covers ONLY the
detr_backbone+detr_head groups as one global norm (`:423-426`) and is
implemented in the train step, not here.

Frozen subtrees (TPU style — optimizer masking instead of requires_grad):
  - `bert` (reference: no_grad+detach)
  - `vocab_embed` (reference: nn.Parameter(requires_grad=False))
  - backbone conv1+layer1 (reference Backbone requires_grad_(False) on every
    body param without layer2/3/4 in its name, backbone.py:61-63)
  - `vision_token`/`lang_token` (dead params — grad None upstream, AdamW
    skips them; see param_group)
  - all `detr` params when `training.freeze` (phase-1 frozen-DETR schedule)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def param_group(path: tuple) -> str:
    """Map a param path (tuple of keys) to its reference optimizer group."""
    keys = [str(k) for k in path]
    name = "/".join(keys)
    if name.startswith("detr/backbone"):
        # the reference Backbone permanently freezes every resnet body param
        # whose name lacks layer2/3/4 — conv1 + all of layer1
        # (backbone.py:61-63, requires_grad_(False) regardless of phase);
        # FrozenBN scale/bias live in batch_stats here, never params
        if len(keys) > 2 and keys[2] in ("layer2", "layer3", "layer4"):
            return "detr_backbone"
        return "frozen"
    if keys[0] == "detr" and keys[1:2] == ["position_embedding"]:
        # learned 2-D pos embedding: upstream it lives at detr.backbone.1.*
        # (the Joiner), so the 'detr.backbone' substring puts it in the
        # BACKBONE lr group, but BackboneBase freezes only body params —
        # it keeps training (train_distr.py:237, backbone.py:61)
        return "detr_backbone"
    if keys[0] == "detr":
        return "detr_head"
    if keys[0] in ("vision_token", "lang_token"):
        # dead params: the reference only reads .device off them
        # (gpv.py:138) so their grad stays None and torch AdamW skips them
        # entirely — no update, no weight decay. optax.adamw would still
        # decay a zero-grad param, so they get the frozen (set_to_zero)
        # label; kept as params at all for released-checkpoint compat.
        return "frozen"
    if keys[0] == "detr_joiner":
        # upstream this falls in the lr-group 'detr_head' ('detr' substring
        # match, train_distr.py:237) with IDENTICAL lr/wd to 'others', is
        # CLIPPED with the detr groups, but is NOT frozen in phase 1
        # (freeze covers only the loaded `detr.*` keys, train_distr.py:136-140)
        return "detr_joiner"
    if keys[0] == "bert":
        return "frozen"
    if keys[0] == "vocab_embed":
        return "frozen"
    return "others"


def group_labels(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, _: param_group(tuple(k.key for k in p)), params)


def warmup_linear_schedule(base_lr: float, total_steps: int,
                           warmup_fraction: float) -> optax.Schedule:
    """LR at optimizer update n (0-indexed) = base * lam(n+1), where lam is
    pytorch_transformers' WarmupLinearSchedule.lr_lambda.

    The +1: torch's LambdaLR calls step() once at construction (the reference
    passes last_epoch=step=0, valid because the MultiStepLR built first set
    initial_lr, train_distr.py:287-305), so the scheduler counter leads the
    update index by one — verified empirically against torch and locked in by
    tests/test_reference_train_parity.py. warmup_steps stays FRACTIONAL
    (lr_warmup_fraction * t_total, train_distr.py:294-305) exactly as
    pytorch_transformers treats it (no int()).
    """
    warmup = warmup_fraction * total_steps

    def schedule(step):
        n = jnp.asarray(step, jnp.float32) + 1.0
        w = n / jnp.maximum(warmup, 1.0)
        d = jnp.maximum(
            (total_steps - n) / jnp.maximum(total_steps - warmup, 1.0),
            0.0)
        return base_lr * jnp.where(n < warmup, w, d)

    return schedule


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int) -> optax.Schedule:
    bounds = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, bounds)


def build_optimizer(training_cfg, steps_per_epoch: int,
                    params,
                    frozen_detr_paths=None) -> optax.GradientTransformation:
    """Build the full 4-group optimizer from the `training` config node.

    frozen_detr_paths: when `training.freeze` is on, the exact set of
    '/'-paths under params['detr'] to freeze (the keys the DETR checkpoint
    actually initialized — reference init_detr_params,
    train_distr.py:136-140). None freezes the whole detr subtree (the
    common case where every key matched).
    """
    total_steps = steps_per_epoch * int(training_cfg.num_epochs)
    lr = float(training_cfg.lr)
    lr_backbone = float(training_cfg.lr_backbone)
    wd = float(training_cfg.weight_decay)

    def make_sched(base):
        if training_cfg.lr_warmup and training_cfg.lr_linear_decay:
            return warmup_linear_schedule(
                base, total_steps, float(training_cfg.lr_warmup_fraction))
        return multistep_schedule(base, training_cfg.lr_milestones,
                                  float(training_cfg.lr_drop),
                                  steps_per_epoch)

    def adamw(base):
        return optax.adamw(make_sched(base), b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)

    frozen_detr = bool(training_cfg.get("freeze", False))
    selective = frozen_detr and frozen_detr_paths is not None
    transforms = {
        "detr_backbone": optax.set_to_zero()
        if (frozen_detr and not selective) else adamw(lr_backbone),
        "detr_head": optax.set_to_zero()
        if (frozen_detr and not selective) else adamw(lr),
        # the joiner keeps training in the frozen phase (reference freezes
        # only the params loaded from the DETR checkpoint; the joiner is
        # randomly initialized and MUST train in phase 1)
        "detr_joiner": adamw(lr),
        "others": adamw(lr),
        "frozen": optax.set_to_zero(),
    }
    labels = group_labels(params)
    if selective:
        # freeze exactly the checkpoint-initialized detr leaves; any detr
        # param the checkpoint did NOT cover (e.g. class_embed under a
        # different num_classes) keeps training, as upstream
        def relabel(path, label):
            keys = tuple(k.key for k in path)
            if keys and keys[0] == "detr" and \
                    "/".join(keys[1:]) in frozen_detr_paths:
                return "frozen"
            return label
        labels = jax.tree_util.tree_map_with_path(relabel, labels)
    return optax.multi_transform(transforms, labels)


def clip_detr_grads(grads, max_norm: float):
    """Clip the detr subtree (backbone+head+joiner) by one joint global norm,
    mirroring `clip_grad_norm_(detr_backbone + detr_head)` (reference
    train_distr.py:423-426; torch uses a *true* clip: scale only if above)."""
    if max_norm <= 0:
        return grads

    def is_detr(path):
        return param_group(path) in ("detr_backbone", "detr_head",
                                     "detr_joiner")

    flat = jax.tree_util.tree_leaves_with_path(grads)
    sq = sum(jnp.sum(jnp.square(g)) for p, g in flat
             if is_detr(tuple(k.key for k in p)))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))

    def apply(path, g):
        return g * scale if is_detr(tuple(k.key for k in path)) else g

    return jax.tree_util.tree_map_with_path(apply, grads)
