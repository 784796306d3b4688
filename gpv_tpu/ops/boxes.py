"""Box geometry ops (pure JAX, all shapes static).

Behavior spec: reference `utils/box_ops.py` (cxcywh<->xyxy conversions at :9,:16,
pairwise `box_iou` returning (iou, union) at :24, `generalized_box_iou` at :40,
`masks_to_boxes` at :62). Rewritten as vectorized jnp with no asserts inside jit
(degenerate boxes are handled by clamping intersections/areas to >= 0 instead of
asserting, so the ops stay usable inside `lax` control flow and vmap).
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x0, y0, x1, y1]."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x0, y0, x1, y1] -> [cx, cy, w, h]."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes -> (...)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: (N,4),(M,4) -> iou (N,M), union (N,M)."""
    area1 = box_area(boxes1)  # (N,)
    area2 = box_area(boxes2)  # (M,)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])  # (N,M,2)
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])  # (N,M,2)

    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]  # (N,M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) of xyxy boxes -> (N, M).

    Unlike the reference (which asserts x1>=x0), degenerate boxes simply
    produce clamped intersections — jit-safe.
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])

    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]  # smallest enclosing box

    return iou - (area - union) / jnp.maximum(area, 1e-9)


def elementwise_generalized_box_iou(boxes1: jnp.ndarray,
                                    boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned xyxy boxes: (..., 4),(..., 4) -> (...).

    Equivalent to `diag(generalized_box_iou(a, b))` in the reference's
    `loss_boxes` (`utils/set_criterion.py:93-96`) but without materializing the
    N x N matrix.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-9)

    elt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    erb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    ewh = jnp.clip(erb - elt, 0.0, None)
    earea = ewh[..., 0] * ewh[..., 1]
    return iou - (earea - union) / jnp.maximum(earea, 1e-9)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary masks -> (N, 4) xyxy boxes (zeros for empty masks)."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    any_on = jnp.any(masks > 0, axis=(1, 2))
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_on[:, None], boxes, jnp.zeros_like(boxes))
