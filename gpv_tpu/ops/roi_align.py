"""RoI align as separable interpolation matmuls (TPU-native, gather-free).

Behavior spec: `torchvision.ops.roi_align(output_size=7, aligned=True)` +
mean-pool, as used by the reference DETR RoI head
(`exp/gpv/models/detr_roi_head.py:44-56`: cxcywh boxes scaled to feature
coords, 7x7 aligned RoI-align on C5, then mean over the 7x7 grid).

Key insight for TPU: bilinear interpolation is separable, and RoI-align's
average pooling commutes with it. A mean-pooled RoI feature is therefore

    out[b, n, c] = sum_{h, w} wy[b, n, h] * wx[b, n, w] * F[b, h, w, c]

where wy/wx are per-roi 1-D interpolation weight vectors over the feature
grid. That turns the whole op into one MXU matmul of shape
(N, H*W) x (H*W, C) per image — no gathers, no dynamic shapes, exact
torchvision `aligned=True` numerics including the adaptive sampling-ratio
rule (grid = ceil(roi_extent / pooled_size), handled with a static max grid
plus masking).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(start: jnp.ndarray, extent: jnp.ndarray, size: int,
                  pooled: int, max_grid: int):
    """1-D interpolation weights for one axis of a batch of RoIs.

    Args:
      start: (...,) roi start coordinate (already offset by -0.5, feature coords).
      extent: (...,) roi extent (end - start).
      size: feature-map size along this axis (static H or W).
      pooled: pooled output size (7).
      max_grid: static upper bound on the adaptive sampling grid.

    Returns:
      per_bin: (..., pooled, size) weights so that
        roi_align_bin[..., p] = sum_h per_bin[..., p, h] * F[..., h]
      mean_w: (..., size) weights of the bin-mean (mean over pooled bins).
    """
    dtype = jnp.float32
    start = start.astype(dtype)
    extent = extent.astype(dtype)
    bin_size = extent / pooled  # (...,)
    # torchvision: roi_bin_grid = ceil(roi_extent / pooled) when sampling_ratio<=0
    grid = jnp.ceil(extent / pooled).astype(jnp.int32)
    grid = jnp.clip(grid, 1, max_grid)  # (...,)

    p = jnp.arange(pooled, dtype=dtype)  # (P,)
    g = jnp.arange(max_grid, dtype=dtype)  # (G,)
    # sample coordinate: start + p*bin + (g + .5) * bin/grid
    gridf = grid.astype(dtype)[..., None, None]  # (...,1,1)
    coord = (start[..., None, None]
             + p[:, None] * bin_size[..., None, None]
             + (g[None, :] + 0.5) * bin_size[..., None, None] / gridf)  # (...,P,G)

    valid = (coord >= -1.0) & (coord <= size)  # torchvision: outside -> 0
    sample_on = g[None, :] < gridf  # (...,P,G) mask of active samples
    coord_c = jnp.clip(coord, 0.0, size - 1.0)

    # hat kernel over the feature grid: (..., P, G, size)
    hgrid = jnp.arange(size, dtype=dtype)
    k = jnp.maximum(0.0, 1.0 - jnp.abs(coord_c[..., None] - hgrid))
    k = k * (valid & sample_on)[..., None].astype(dtype)

    # average over active samples in each bin (count = grid per torchvision)
    per_bin = jnp.sum(k, axis=-2) / gridf  # (..., P, size)
    mean_w = jnp.mean(per_bin, axis=-2)  # (..., size)
    return per_bin, mean_w


def _scale_boxes(boxes_cxcywh: jnp.ndarray, height: int, width: int):
    """cxcywh normalized boxes -> aligned roi starts/extents in feature coords."""
    cx, cy, w, h = [boxes_cxcywh[..., i] for i in range(4)]
    x0 = width * (cx - 0.5 * w) - 0.5  # aligned=True pixel-center offset
    y0 = height * (cy - 0.5 * h) - 0.5
    wx = width * w
    wy = height * h
    return y0, wy, x0, wx


def roi_align_mean_pooled(features: jnp.ndarray, boxes_cxcywh: jnp.ndarray,
                          pooled: int = 7, max_grid: int = 8) -> jnp.ndarray:
    """Mean-pooled aligned RoI-align.

    Args:
      features: (B, H, W, C) feature map (NHWC).
      boxes_cxcywh: (B, N, 4) boxes normalized to [0,1] in cxcywh.

    Returns:
      (B, N, C) mean-pooled RoI features, exact torchvision
      `roi_align(output_size=pooled, aligned=True, sampling_ratio=-1)` then
      `.mean((-1,-2))` semantics.
    """
    B, H, W, C = features.shape
    y0, hy, x0, wx_ = _scale_boxes(boxes_cxcywh, H, W)
    _, wy = _axis_weights(y0, hy, H, pooled, max_grid)  # (B,N,H)
    _, wx = _axis_weights(x0, wx_, W, pooled, max_grid)  # (B,N,W)
    # outer product of axis weights -> (B,N,H,W), then one big contraction
    whw = wy[..., :, None] * wx[..., None, :]
    return jnp.einsum('bnhw,bhwc->bnc', whw, features,
                      preferred_element_type=jnp.float32)


def roi_align(features: jnp.ndarray, boxes_cxcywh: jnp.ndarray,
              pooled: int = 7, max_grid: int = 8) -> jnp.ndarray:
    """Full (B, N, pooled, pooled, C) aligned RoI-align (same semantics)."""
    B, H, W, C = features.shape
    y0, hy, x0, wx_ = _scale_boxes(boxes_cxcywh, H, W)
    py, _ = _axis_weights(y0, hy, H, pooled, max_grid)  # (B,N,P,H)
    px, _ = _axis_weights(x0, wx_, W, pooled, max_grid)  # (B,N,P,W)
    t = jnp.einsum('bnph,bhwc->bnpwc', py, features,
                   preferred_element_type=jnp.float32)
    return jnp.einsum('bnpwc,bnqw->bnpqc', t, px,
                      preferred_element_type=jnp.float32)
