"""DETR detector with optional RoI head (the GPV visual stream).

Behavior spec: reference `exp/gpv/models/detr.py` + `detr_roi_head.py` —
ResNet-50 C5 -> 1x1 proj to 256 -> DETR transformer (6+6) -> 100 query states;
class head (num_classes+1 logits) and 3-layer sigmoid cxcywh box MLP;
`last_layer_only`/eval keeps the final decoder layer; RoI head
(`detr_roi_head.py:44-56,89-92`): aligned 7x7 roi_align on C5 at the predicted
boxes, mean-pooled, LayerNormed, concatenated with the 256-d query states to a
2304-d `detr_hs`.

TPU design: NHWC features; roi_align is the gather-free separable-matmul
formulation in `gpv_tpu.ops.roi_align`; all shapes static.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.detr_transformer import DetrTransformer
from ..nn.layers import MLP
from ..nn.resnet import ResNet
from ..ops.posenc import (LearnedPositionEmbedding2D,
                          sine_position_embedding_2d)
from ..ops.roi_align import roi_align_mean_pooled


class DETR(nn.Module):
    num_queries: int = 100
    num_classes: int = 1
    hidden_dim: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    backbone_layers: tuple = (3, 4, 6, 3)
    dilation: bool = False
    stem_s2d: bool = False  # exact space-to-depth stem (ops/stem_s2d.py)
    last_layer_only: bool = True
    aux_loss: bool = False
    roi_head: bool = True
    roi_pooled: int = 7
    roi_max_grid: int = 8
    position_embedding: str = "sine"  # 'sine'/'v2' or 'learned'/'v3'
    pre_norm: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 image_valid: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """images: (B, H, W, 3) normalized; image_valid: (B, H, W) bool.

        Returns dict with pred_relevance_logits (B,Q,K+1), pred_boxes (B,Q,4),
        detr_hs (L,B,Q,2304 or 256), and aux lists when aux_loss.
        """
        B, H, W, _ = images.shape
        images = images.astype(self.dtype)  # halve HBM traffic into conv1
        feats = ResNet(layers=self.backbone_layers, return_layers=("layer4",),
                       dilate_c5=self.dilation, remat=self.remat,
                       stem_s2d=self.stem_s2d, dtype=self.dtype,
                       name="backbone")(images)["layer4"]  # (B, h, w, 2048)
        h, w = feats.shape[1:3]

        if image_valid is None:
            feat_valid = jnp.ones((B, h, w), bool)
        else:
            # nearest-neighbor downsample of the validity mask (reference
            # interpolates the padding mask, backbone.py:77)
            ys = (jnp.arange(h) * (H / h)).astype(jnp.int32)
            xs = (jnp.arange(w) * (W / w)).astype(jnp.int32)
            feat_valid = image_valid[:, ys][:, :, xs]

        if self.position_embedding in ("sine", "v2"):
            pos = sine_position_embedding_2d(
                feat_valid, num_pos_feats=self.hidden_dim // 2)  # (B,h,w,256)
        elif self.position_embedding in ("learned", "v3"):
            pos = LearnedPositionEmbedding2D(
                num_pos_feats=self.hidden_dim // 2,
                name="position_embedding")(B, h, w)
        else:
            # same loud rejection as the reference builder
            # (position_encoding.py:86-87)
            raise ValueError(
                f"not supported {self.position_embedding!r} "
                "(expected sine/v2 or learned/v3)")

        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      name="input_proj")(feats)
        src = src.reshape(B, h * w, self.hidden_dim)
        pos = pos.reshape(B, h * w, self.hidden_dim).astype(self.dtype)
        key_valid = feat_valid.reshape(B, h * w)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))

        return_intermediate = self.aux_loss and train and not self.last_layer_only
        hs, _ = DetrTransformer(
            dim=self.hidden_dim, num_heads=self.nheads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            ffn_dim=self.dim_feedforward, dropout=self.dropout,
            return_intermediate=True, remat=self.remat, dtype=self.dtype,
            pre_norm=self.pre_norm,
            name="transformer")(src, pos, query_embed, key_valid,
                                deterministic=not train)
        # (L, B, Q, D) -> keep only the final layer unless aux supervision
        if not return_intermediate:
            hs = hs[-1:]

        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               name="class_embed")
        bbox_embed = MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                         name="bbox_embed")
        outputs_class = class_embed(hs)           # (L,B,Q,K+1)
        outputs_coord = nn.sigmoid(bbox_embed(hs))  # (L,B,Q,4)

        out = {
            "pred_relevance_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
        }
        if self.aux_loss and return_intermediate:
            out["aux_pred_relevance_logits"] = outputs_class[:-1]
            out["aux_pred_boxes"] = outputs_coord[:-1]

        if self.roi_head:
            # no gradient into the box COORDINATES: torchvision.ops.roi_align
            # (the reference's extractor, detr_roi_head.py:45-55) only
            # implements backward w.r.t. the input features — rois get no
            # grad — so bbox_embed must not receive a pooling-path gradient
            # (verified against torch in tests/test_reference_train_parity.py)
            roi = roi_align_mean_pooled(feats,
                                        jax.lax.stop_gradient(
                                            out["pred_boxes"]),
                                        pooled=self.roi_pooled,
                                        max_grid=self.roi_max_grid)  # (B,Q,2048)
            roi = roi[None].astype(self.dtype)  # (1,B,Q,2048)
            # parameter-free layer_norm (reference uses F.layer_norm,
            # detr_roi_head.py:91 — no learned affine)
            mean = jnp.mean(roi, axis=-1, keepdims=True)
            var = jnp.var(roi, axis=-1, keepdims=True)
            roi = (roi - mean) * jax.lax.rsqrt(var + 1e-5)
            roi = jnp.broadcast_to(roi, (hs.shape[0], *roi.shape[1:]))
            out["detr_hs"] = jnp.concatenate([roi, hs], axis=-1)  # (L,B,Q,2304)
        else:
            out["detr_hs"] = hs
        return out


def detr_from_config(cfg, roi_head: bool, dtype=jnp.float32) -> DETR:
    """Build from the `model.detr` config node (configs/exp/gpv.yaml schema)."""
    return DETR(
        num_queries=cfg.num_queries,
        num_classes=cfg.num_classes,
        hidden_dim=cfg.hidden_dim,
        nheads=cfg.nheads,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        dim_feedforward=cfg.dim_feedforward,
        dropout=cfg.dropout,
        dilation=cfg.dilation,
        last_layer_only=cfg.last_layer_only,
        aux_loss=cfg.aux_loss,
        roi_head=roi_head,
        position_embedding=str(cfg.get("position_embedding", "sine")),
        pre_norm=bool(cfg.get("pre_norm", False)),
        dtype=dtype)
