"""Positional encodings.

Behavior spec: reference `exp/gpv/models/position_encoding.py` (2-D sine at :12
— cumsum-of-valid-mask normalized to 2*pi, temperature 10000, d/2 features per
axis, y-features then x-features; learned 50x50 at :51) and the 1-D sine table
`positionalencoding1d` (`exp/gpv/models/gpv.py:18`).

TPU notes: everything is computed in fp32 and returned in channel-last layout
(B, H, W, C) to match NHWC convs; callers flatten to sequence form.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def sine_position_embedding_2d(valid_mask: jnp.ndarray,
                               num_pos_feats: int = 128,
                               temperature: float = 10000.0,
                               normalize: bool = True,
                               scale: float | None = None) -> jnp.ndarray:
    """2-D sine embedding over a validity mask.

    Args:
      valid_mask: (B, H, W) bool/float, True (or 1) on VALID pixels. NOTE the
        reference passes a *padding* mask and negates it; here we take the
        valid mask directly.
      num_pos_feats: features per axis (d_model // 2).

    Returns:
      (B, H, W, 2 * num_pos_feats) fp32, concat of [y-features, x-features].
    """
    if scale is None:
        scale = 2.0 * math.pi
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x_embed[:, :, :, None] / dim_t  # (B,H,W,F)
    pos_y = y_embed[:, :, :, None] / dim_t
    # interleave sin/cos: [sin(p0), cos(p1), sin(p2), cos(p3), ...]
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionEmbedding2D(nn.Module):
    """Learned absolute 2-D position embedding (the `detr.position_embedding:
    learned` / 'v3' variant).

    Behavior spec: reference `PositionEmbeddingLearned`
    (exp/gpv/models/position_encoding.py:51-76) — 50-entry row/col embedding
    tables initialized U(0,1), output per pixel = concat[col(x) features,
    row(y) features] (x first — NOTE the sine variant concats y first).
    Ignores the validity mask, like the reference.
    """
    num_pos_feats: int = 128
    table_size: int = 50

    @nn.compact
    def __call__(self, batch: int, h: int, w: int) -> jnp.ndarray:
        if h > self.table_size or w > self.table_size:
            raise ValueError(
                f"learned position embedding table ({self.table_size}) too "
                f"small for a {h}x{w} feature map")
        init = nn.initializers.uniform(scale=1.0)  # torch nn.init.uniform_
        row = self.param("row_embed", init,
                         (self.table_size, self.num_pos_feats))
        col = self.param("col_embed", init,
                         (self.table_size, self.num_pos_feats))
        x_emb = jnp.broadcast_to(col[None, :w], (h, w, self.num_pos_feats))
        y_emb = jnp.broadcast_to(row[:h, None], (h, w, self.num_pos_feats))
        pos = jnp.concatenate([x_emb, y_emb], axis=-1)  # (h, w, 2F)
        return jnp.broadcast_to(pos[None], (batch, h, w,
                                            2 * self.num_pos_feats))


def sine_position_encoding_1d(d_model: int, length: int) -> jnp.ndarray:
    """1-D sine table, (length, d_model): even dims sin, odd dims cos.

    Matches `positionalencoding1d` (`exp/gpv/models/gpv.py:18-34`).
    """
    if d_model % 2 != 0:
        raise ValueError(f"d_model must be even, got {d_model}")
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * -(math.log(10000.0) / d_model))
    ang = position * div_term  # (L, d/2)
    pe = jnp.zeros((length, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe
