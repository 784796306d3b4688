"""GPV multitask criterion — static-shape, fully masked, jit-resident.

Behavior spec: reference `exp/gpv/models/losses.py` (GPVCriterion :141 with
CaptionLoss/VqaLoss/ClsLoss text CE + Localization) and `utils/set_criterion.py`
(labels CE with eos down-weighting, L1+GIoU box losses over Hungarian-matched
pairs). The reference FILTERS the batch per task (dynamic shapes) and returns
None when a task is absent (DDP needs `find_unused_parameters`). Here every
loss is computed over the full static batch and MASKED per task, so one XLA
graph covers every batch mixture — the TPU-native replacement for
unused-parameter detection (SURVEY.md §2.7).

Semantics parity notes:
- text CE per task = mean over that task's samples of (sum over sequence
  positions of CE), including pad positions up to the batch answer-length max
  (the reference pads to batch max and does not ignore pads — losses.py
  pad_idx: null). The batch max is reproduced with a dynamic position mask.
- localization num_boxes normalization = total GT boxes over box-bearing
  samples, clamped to >= 1 (`set_criterion.py:160-169`).
- label CE uses torch's weighted-CE normalization: sum(w[y]*ce) / sum(w[y])
  with w = [1, eos_coef].
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy, elementwise_generalized_box_iou
from ..ops.matcher import hungarian_match

# task-id encoding shared framework-wide (datasets -> batches -> losses)
TASK_IDS = {
    "CocoCaptioning": 0,
    "CocoVqa": 1,
    "CocoClassification": 2,
    "CocoDetection": 3,
    "RefCocop": 4,
}
TEXT_TASKS = ("CocoCaptioning", "CocoVqa", "CocoClassification")


class LossConfig(NamedTuple):
    caption_wt: float = 5e-2
    vqa_wt: float = 1.0
    cls_wt: float = 1.0
    loss_ce_wt: float = 1.0
    loss_bbox_wt: float = 5.0
    loss_giou_wt: float = 2.0
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    eos_coef: float = 0.1
    num_classes: int = 1

    @classmethod
    def from_config(cls, cfg) -> "LossConfig":
        """Build from the `losses` node of configs/exp/gpv.yaml."""
        return cls(
            caption_wt=float(cfg.CaptionLoss.loss_wts.loss_caption),
            vqa_wt=float(cfg.VqaLoss.loss_wts.loss_vqa),
            cls_wt=float(cfg.ClsLoss.loss_wts.loss_cls),
            loss_ce_wt=float(cfg.Localization.loss_wts.loss_ce),
            loss_bbox_wt=float(cfg.Localization.loss_wts.loss_bbox),
            loss_giou_wt=float(cfg.Localization.loss_wts.loss_giou),
            cost_class=float(cfg.Localization.cost_wts.ce),
            cost_bbox=float(cfg.Localization.cost_wts.bbox),
            cost_giou=float(cfg.Localization.cost_wts.giou),
            eos_coef=float(cfg.Localization.eos_coef),
            num_classes=int(cfg.Localization.num_classes))


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


def sigmoid_focal_loss(logits, targets, num_boxes, alpha: float = 0.25,
                       gamma: float = 2.0):
    """Segmentation focal loss (reference `utils/set_criterion.py` masks
    branch; unused in the default GPV config where masks=False, kept for
    capability parity). logits/targets: (N, P)."""
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(axis=1).sum() / jnp.maximum(num_boxes, 1.0)


def optax_sigmoid_ce(logits, labels):
    zeros = jnp.zeros_like(logits)
    return (jnp.maximum(logits, zeros) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def dice_loss(logits, targets, num_boxes):
    """Mask dice loss (same provenance as `sigmoid_focal_loss`)."""
    probs = jax.nn.sigmoid(logits)
    numerator = 2 * jnp.sum(probs * targets, axis=1)
    denominator = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return jnp.sum(loss) / jnp.maximum(num_boxes, 1.0)


def text_ce_losses(answer_logits: jnp.ndarray, answer_ids: jnp.ndarray,
                   answer_lens: jnp.ndarray, task_id: jnp.ndarray,
                   has_answer: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-task teacher-forced CE.

    Args:
      answer_logits: (B, S-1, V) logits for positions 1..S-1.
      answer_ids: (B, S) token ids including leading __cls__.
      answer_lens: (B,) true encoded lengths (cls..stop inclusive).
      task_id/has_answer: (B,) ints / bool.
    """
    logits = answer_logits.astype(jnp.float32)
    tgt = answer_ids[:, 1:]
    # CE in logsumexp-gather form: CE[b,s] = lse(logits[b,s]) -
    # logits[b,s,tgt]. Identical math to -log_softmax(...)[tgt] (same
    # max-subtracted stabilization), but the (B,S-1,V) fp32 log-softmax
    # tensor (91 MB at B=120/V=10k) is never materialized for the gather —
    # only the (B,S-1) reductions leave the fusion (BASELINE.md 'r4
    # criterion traffic').
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B,S-1)
    tgt_logit = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
    ce = lse - tgt_logit  # (B,S-1)
    # reproduce reference batch-max padding: positions < max(len)-1 count
    smax = jnp.max(jnp.where(has_answer, answer_lens, 0))
    pos_ok = jnp.arange(tgt.shape[1])[None, :] < (smax - 1)
    per_sample = jnp.sum(ce * pos_ok, axis=1)  # (B,)

    out = {}
    for task in TEXT_TASKS:
        mask = (task_id == TASK_IDS[task]) & has_answer
        cnt = jnp.sum(mask)
        out[task] = (_safe_div(jnp.sum(per_sample * mask), cnt), cnt)
    return out


def localization_losses(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                        tgt_boxes: jnp.ndarray, tgt_labels: jnp.ndarray,
                        box_valid: jnp.ndarray, has_boxes: jnp.ndarray,
                        cfg: LossConfig) -> Dict[str, jnp.ndarray]:
    """DETR set losses over Hungarian-matched pairs (masked static shapes).

    Args:
      pred_logits: (B, Q, K+1); pred_boxes: (B, Q, 4) cxcywh.
      tgt_boxes: (B, M, 4); tgt_labels: (B, M); box_valid: (B, M) bool.
      has_boxes: (B,) bool — sample carries box supervision (det/refexp).
    """
    B, Q, K1 = pred_logits.shape
    M = tgt_boxes.shape[1]
    valid = box_valid & has_boxes[:, None]  # (B, M)

    q4t = hungarian_match(
        jax.lax.stop_gradient(pred_logits.astype(jnp.float32)),
        jax.lax.stop_gradient(pred_boxes.astype(jnp.float32)),
        tgt_labels, tgt_boxes, valid,
        cost_class=cfg.cost_class, cost_bbox=cfg.cost_bbox,
        cost_giou=cfg.cost_giou)  # (B, M)

    num_boxes = jnp.maximum(jnp.sum(valid), 1.0)

    # ---- label CE: scatter matched target labels onto queries -------------
    # one_hot over queries of each valid target's assigned query
    assign = jax.nn.one_hot(q4t, Q, dtype=jnp.float32) * valid[..., None]
    # target class per query: matched -> label (0), else no-object (K)
    matched = jnp.sum(assign, axis=1)  # (B, Q) in {0,1}
    # (labels are always 0 in GPV; keep general via weighted scatter)
    lbl_scatter = jnp.einsum("bm,bmq->bq", tgt_labels.astype(jnp.float32) + 1,
                             assign)
    target_classes = jnp.where(matched > 0, lbl_scatter - matched,
                               cfg.num_classes).astype(jnp.int32)  # (B,Q)
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == cfg.num_classes, cfg.eos_coef, 1.0)
    w = w * has_boxes[:, None]  # only box-bearing samples
    loss_ce = _safe_div(jnp.sum(w * ce), jnp.sum(w))

    # ---- box losses over matched pairs ------------------------------------
    src = jnp.take_along_axis(pred_boxes, q4t[..., None], axis=1)  # (B,M,4)
    l1 = jnp.sum(jnp.abs(src - tgt_boxes), axis=-1) * valid
    loss_bbox = jnp.sum(l1) / num_boxes
    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt_boxes))
    loss_giou = jnp.sum((1.0 - giou) * valid) / num_boxes

    cnt = jnp.sum(has_boxes)
    return {
        "loss_ce": (loss_ce, cnt),
        "loss_bbox": (loss_bbox, cnt),
        "loss_giou": (loss_giou, cnt),
        "cardinality_error": (_safe_div(jnp.sum(jnp.abs(
            jnp.sum(jnp.argmax(pred_logits, -1) != K1 - 1, axis=-1)
            - jnp.sum(valid, axis=-1)) * has_boxes), cnt), cnt),
    }


def gpv_criterion(outputs: Dict[str, Any], batch: Dict[str, Any],
                  cfg: LossConfig):
    """Total multitask loss (scalar) + loss dict, all inside jit.

    `batch` fields: answer_ids (B,S), answer_lens (B,), task_id (B,),
    has_answer (B,), boxes (B,M,4), box_labels (B,M), box_valid (B,M),
    has_boxes (B,).
    """
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)

    if "answer_logits" in outputs:
        text = text_ce_losses(outputs["answer_logits"], batch["answer_ids"],
                              batch["answer_lens"], batch["task_id"],
                              batch["has_answer"])
        for task, wt, name in (
                ("CocoCaptioning", cfg.caption_wt, "loss_caption"),
                ("CocoVqa", cfg.vqa_wt, "loss_vqa"),
                ("CocoClassification", cfg.cls_wt, "loss_cls")):
            val, cnt = text[task]
            losses[name] = val
            total = total + wt * jnp.where(cnt > 0, val, 0.0)

    loc = localization_losses(
        outputs["pred_relevance_logits"], outputs["pred_boxes"],
        batch["boxes"], batch["box_labels"], batch["box_valid"],
        batch["has_boxes"], cfg)
    for name, wt in (("loss_ce", cfg.loss_ce_wt),
                     ("loss_bbox", cfg.loss_bbox_wt),
                     ("loss_giou", cfg.loss_giou_wt)):
        val, cnt = loc[name]
        losses[name] = val
        total = total + wt * jnp.where(cnt > 0, val, 0.0)
    losses["cardinality_error"] = loc["cardinality_error"][0]

    # aux decoder layers (aux_loss=True): re-match per layer
    if "aux_pred_relevance_logits" in outputs:
        aux_l = outputs["aux_pred_relevance_logits"]
        aux_b = outputs["aux_pred_boxes"]
        for i in range(aux_l.shape[0]):
            loc_i = localization_losses(
                aux_l[i], aux_b[i], batch["boxes"], batch["box_labels"],
                batch["box_valid"], batch["has_boxes"], cfg)
            for name, wt in (("loss_ce", cfg.loss_ce_wt),
                             ("loss_bbox", cfg.loss_bbox_wt),
                             ("loss_giou", cfg.loss_giou_wt)):
                val, cnt = loc_i[name]
                losses[f"{name}_{i}"] = val
                total = total + wt * jnp.where(cnt > 0, val, 0.0)

    losses["total_loss"] = total
    return total, losses
