"""Jitted, mesh-sharded multitask train step.

Behavior spec: reference hot loop (`exp/gpv/train_distr.py:399-471`):
forward (teacher-forced) -> GPVCriterion -> backward -> clip detr grads 0.1 ->
AdamW step, with DDP all-reducing grads. TPU-native: one `jax.jit` over the
whole step with the batch sharded on the mesh `data` axis and state
replicated; XLA inserts the gradient psum over ICI. Buffers are donated so
params/opt state update in place in HBM. Matching runs ON DEVICE inside the
step (see ops/matcher.py) — the reference's per-step scipy host sync is gone.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.criterion import LossConfig, gpv_criterion
from ..train.optimizer import clip_detr_grads, param_group
from .mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, optimizer) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params))


def make_train_step(model, optimizer, loss_cfg: LossConfig,
                    clip_max_norm: float = 0.1,
                    mesh=None, donate: bool = True,
                    state_template=None, grad_accum: int = 1,
                    freeze_detr: bool = False,
                    frozen_detr_paths=None) -> Callable:
    """Build the jitted train step.

    batch dict fields (all static shapes, leading dim = global batch):
      image (B,H,W,3) fp32 normalized or uint8 (normalized in-graph);
      query_ids (B,Tq) + query_valid (B,Tq);
      answer_ids (B,S); answer_lens (B,); task_id (B,); has_answer (B,);
      boxes (B,M,4); box_labels (B,M); box_valid (B,M); has_boxes (B,).

    grad_accum > 1 splits the (per-device) batch into that many microbatches
    scanned sequentially, averaging gradients AND losses before one
    optimizer step — each microbatch uses its own loss normalization, which
    is exactly the reference's DDP semantics (each GPU normalizes over its
    own shard of the global 120 batch before the gradient all-reduce,
    `train_distr.py:192,202`). This is how the reference batch-120 recipe
    fits a 16 GB v5e chip (see BASELINE.md). Activations of one microbatch
    are freed before the next, so peak memory scales with B/grad_accum.

    With a mesh whose `model` axis > 1 and a `state_template` (a TrainState,
    used only for structure/shapes), parameters get Megatron-style tensor-
    parallel shardings from `sharding_rules.py`; the batch stays sharded on
    the data axis and GSPMD inserts the TP collectives.
    """

    def loss_fn(params, batch_stats, batch, rng):
        # Permanently-frozen backbone stem (reference Backbone sets
        # requires_grad_(False) on conv1+layer1, backbone.py:61-63, in EVERY
        # phase): stop_gradient lets XLA DCE the whole backward below layer2
        # — the highest-resolution convs — and keeps the detr clip norm
        # torch-exact (torch's clip_grad_norm_ skips grad-None params).
        params = dict(params)
        params["detr"] = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.lax.stop_gradient(x)
            if param_group(("detr",) + tuple(k.key for k in p)) == "frozen"
            else x,
            params["detr"])
        if freeze_detr:
            # phase-1 frozen-DETR schedule: stop_gradient lets XLA ELIMINATE
            # the entire backward through the DETR tower (the reference's
            # requires_grad=False, train_distr.py:136-140 — its optimizer
            # masking alone would still compute the gradients only to
            # discard them). detr_joiner stays trainable.
            # frozen_detr_paths (the keys the DETR checkpoint actually
            # initialized — reference init_detr_params) restricts the
            # freeze to exactly those leaves; a non-loaded detr param
            # (shape-mismatched class_embed etc.) keeps its gradient.
            if frozen_detr_paths is None:
                params["detr"] = jax.lax.stop_gradient(params["detr"])
            else:
                params["detr"] = jax.tree_util.tree_map_with_path(
                    lambda p, x: jax.lax.stop_gradient(x)
                    if "/".join(k.key for k in p) in frozen_detr_paths
                    else x,
                    params["detr"])
        batch = dict(batch)
        if batch["image"].dtype == jnp.uint8:
            # normalize IN-GRAPH: the loader ships uint8 (4x less host->
            # device bandwidth) and XLA fuses the cast+normalize into the
            # first conv's input (same as engine._encode for inference)
            from ..ops.image import normalize_image
            batch["image"] = normalize_image(
                batch["image"].astype(jnp.float32) / 255.0)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outputs = model.apply(
            variables, batch["image"], batch["query_ids"],
            batch["answer_ids"], image_valid=batch.get("image_valid"),
            query_valid=batch["query_valid"], train=True,
            query_enc=batch.get("query_enc"),
            rngs={"dropout": rng})
        total, losses = gpv_criterion(outputs, batch, loss_cfg)
        return total, losses

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        if "query_uniq_ids" in batch:
            # Frozen-BERT dedup (BASELINE.md 'r4 query dedup'): the collator
            # found the batch's unique query rows (multitask batches repeat
            # the ~36 task templates across most of the ~120 rows); encode
            # those ONCE — outside the grad-accum scan, BERT is frozen and
            # dropout-free so this is exact — and gather back to (B,Tl,768).
            batch = dict(batch)
            uniq_enc = model.apply(
                {"params": state.params,
                 **({"batch_stats": state.batch_stats}
                    if state.batch_stats else {})},
                batch.pop("query_uniq_ids"), batch.pop("query_uniq_valid"),
                method="encode_queries")
            batch["query_enc"] = jnp.take(uniq_enc, batch.pop("query_gather"),
                                          axis=0)

        if grad_accum <= 1:
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, rng)
        else:
            B = batch["image"].shape[0]
            assert B % grad_accum == 0, (
                f"batch {B} not divisible by grad_accum {grad_accum}")
            m = B // grad_accum
            micro_batches = jax.tree.map(
                lambda x: x.reshape(grad_accum, m, *x.shape[1:]), batch)

            def micro(carry, xs):
                acc_g, acc_l = carry
                mb, i = xs
                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    state.params, state.batch_stats, mb,
                    jax.random.fold_in(rng, i))
                acc_g = jax.tree.map(jnp.add, acc_g, grads)
                acc_l = jax.tree.map(jnp.add, acc_l, losses)
                return (acc_g, acc_l), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            # loss dict structure via eval_shape (no compute)
            loss_shape = jax.eval_shape(
                lambda: loss_fn(state.params, state.batch_stats,
                                jax.tree.map(lambda x: x[0], micro_batches),
                                rng)[1])
            zeros_l = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), loss_shape)
            (grads, losses), _ = jax.lax.scan(
                micro, (zeros_g, zeros_l),
                (micro_batches, jnp.arange(grad_accum)))
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            losses = jax.tree.map(lambda v: v * inv, losses)

        grads = clip_detr_grads(grads, clip_max_norm)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, losses

    # Single-device meshes take the plain jit path: semantics are identical
    # and some single-chip environments (e.g. the axon relay used for dev)
    # run sharded executables ~40x slower. Real multi-chip meshes use
    # explicit shardings so XLA partitions and emits the ICI collectives.
    if mesh is None or mesh.size == 1:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)

    from .mesh import MODEL_AXIS
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1 and state_template is not None
    if tp:
        from .sharding_rules import make_param_shardings
        param_sh = make_param_shardings(mesh, state_template.params)
        state_sh = TrainState(
            step=repl,
            params=param_sh,
            batch_stats=jax.tree.map(lambda _: repl,
                                     state_template.batch_stats),
            opt_state=jax.tree.map(lambda _: repl,
                                   state_template.opt_state))
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data, repl),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,) if donate else ())

    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())
