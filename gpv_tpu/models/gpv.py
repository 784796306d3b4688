"""GPV-1 top-level model: image + query -> boxes, relevance, answer text.

Behavior spec: reference `exp/gpv/models/gpv.py` `GPV` —
  DETR(+RoI) visual stream -> detr_joiner Linear 2304->768;
  frozen BERT text stream -> bert_joiner Linear 768->768;
  3x co-attention fusion layers (text stream <-> vision-query stream);
  relevance head Linear 768->2 ADDED to the DETR class logits (gpv.py:161-168);
  relevance conditioning: softmax-weighted blend of 2 learned tokens added
  back to the fused vision states (gpv.py:364-375);
  text decoder over memory = concat(vision states, text states) with the
  fixed-vocab-embedding answer head (answer_head.py:8-33).

TPU design decisions:
- single (B, T, D) batch-first layout; the decoder-layer axis L of the
  reference is dropped (default config is last_layer_only=True, aux_loss=False
  -> L=1 everywhere; aux relevance logits are still produced for the
  localization aux losses when enabled).
- BERT is frozen via `stop_gradient` + optimizer masking (XLA keeps one static
  graph; no torch-style `no_grad` regions).
- the sampling decode paths live in `gpv_tpu.decode` and drive the
  `precompute_text_memory` / `text_step` methods with a KV cache under
  `lax.scan` — unlike the reference, the prefix is never re-encoded.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.bert import BertEncoder
from ..nn.coattention import CoAttentionLayer
from ..nn.text_decoder import TextDecoder
from ..ops.posenc import sine_position_encoding_1d
from .detr import DETR


class GPV(nn.Module):
    """Flagship model. Construct via `build_gpv(cfg)` for config parity."""
    vocab_size: int
    hidden_dim: int = 768
    max_text_len: int = 20
    max_pos_enc_len: int = 30
    text_pos_enc: bool = False
    relevance_conditioning: bool = True
    # True (default): padded query positions are masked out of fusion +
    # decode (batch-1 semantics). False: reproduce the reference's batched
    # no-mask semantics exactly (PARITY.md #12). Parameter-compatible.
    mask_query_pads: bool = True
    answer_head: Optional[str] = None  # None = vocab-embed classifier, 'linear'
    co_att_num_layers: int = 3
    co_att_heads: int = 16
    co_att_intermediate: int = 3072
    # extra per-stream CoAttentionLayer kwargs (intermediate2/dropout2/
    # attn_dropout{,2}/act{,2}); None keys tie to stream 1 like the
    # reference's interpolated config
    co_att_extra: Dict[str, Any] = None
    dropout: float = 0.1
    text_decoder_layers: int = 3
    text_decoder_heads: int = 8
    text_decoder_dropout: Optional[float] = None  # None -> self.dropout
    detr_cfg: Dict[str, Any] = None
    roi_head: bool = True
    bert_layers: int = 12
    bert_hidden: int = 768
    bert_heads: int = 12
    bert_vocab_size: int = 30522
    bert_max_len: int = 512
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        detr_kwargs = dict(self.detr_cfg or {})
        self.detr = DETR(roi_head=self.roi_head, remat=self.remat,
                         dtype=self.dtype, **detr_kwargs)
        self.detr_joiner = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.bert = BertEncoder(num_layers=self.bert_layers,
                                hidden=self.bert_hidden,
                                heads=self.bert_heads,
                                intermediate=4 * self.bert_hidden,
                                vocab_size=self.bert_vocab_size,
                                max_len=self.bert_max_len,
                                dtype=self.dtype)
        self.bert_joiner = nn.Dense(self.hidden_dim, dtype=self.dtype)
        # static_argnums counts the module at 0; `deterministic` is arg 5
        CoAtt = nn.remat(CoAttentionLayer, static_argnums=(5,)) \
            if self.remat else CoAttentionLayer
        co_att_kwargs = dict(dropout=self.dropout)
        co_att_kwargs.update(self.co_att_extra or {})
        self.co_att = [
            CoAtt(self.hidden_dim, self.co_att_heads,
                  self.co_att_intermediate,
                  dtype=self.dtype, name=f"co_att{i}", **co_att_kwargs)
            for i in range(self.co_att_num_layers)]
        num_classes = detr_kwargs.get("num_classes", 1)
        self.relevance_predictor = nn.Dense(num_classes + 1, dtype=self.dtype)
        self.text_decoder = TextDecoder(
            dim=self.hidden_dim, num_heads=self.text_decoder_heads,
            num_layers=self.text_decoder_layers,
            dropout=(self.dropout if self.text_decoder_dropout is None
                     else self.text_decoder_dropout),
            dtype=self.dtype)
        # answer machinery: fixed vocab embedding + learned transforms
        self.vocab_embed = self.param(
            "vocab_embed",
            lambda key, shape: 0.1 * jax.random.normal(key, shape),
            (self.vocab_size, self.hidden_dim))
        if self.answer_head == "linear":
            self.classifier = nn.Dense(self.vocab_size, dtype=self.dtype)
        else:
            self.classifier_transform = nn.Dense(self.hidden_dim,
                                                 dtype=self.dtype)
        self.answer_input_transform = nn.Dense(self.hidden_dim,
                                               dtype=self.dtype)
        # indicator/conditioning tokens (vision/lang tokens kept for ckpt
        # parity with the reference even though its forward never uses them)
        init01 = lambda key, shape: 0.1 * jax.random.normal(key, shape)
        self.vision_token = self.param("vision_token", init01,
                                       (self.hidden_dim,))
        self.lang_token = self.param("lang_token", init01, (self.hidden_dim,))
        self.relevance_tokens = self.param("relevance_tokens", init01,
                                           (2, self.hidden_dim))
        self.pos_enc_table = sine_position_encoding_1d(
            self.hidden_dim, self.max_pos_enc_len)

    # ---------------- encoding ----------------

    def encode_queries(self, query_ids, query_valid=None):
        """Frozen-BERT query encodings: (N,Tl) ids -> (N,Tl,768), detached.

        Factored out of `encode` so the training step can hoist it OUT of
        the gradient/accumulation scope and run it on the batch's UNIQUE
        query rows only (multitask batches repeat the ~36 task templates
        across most rows — reference preprocess templates; BASELINE.md
        'r3 roofline' names BERT's 6.8 ms / 3.7 GB as addressable). BERT is
        frozen (reference no_grad + detach, gpv.py:142-145) and runs
        dropout-free even in training, so encoding a row once is exact.
        """
        query_enc = self.bert(query_ids, valid=query_valid,
                              deterministic=True)
        return jax.lax.stop_gradient(query_enc)

    def encode(self, images, query_ids, image_valid=None, query_valid=None,
               train: bool = False, query_enc=None):
        """Run both streams + fusion.

        `query_enc` (B,Tl,768), when given, is a precomputed
        `encode_queries` output (possibly dedup-gathered by the caller);
        BERT is then skipped. `query_valid` keeps its (B,Tl) meaning either
        way (it also masks fusion/decode below).

        Returns (memory (B,Tm,D), mem_valid (B,Tm) or None, outputs dict).
        """
        outputs = dict(self.detr(images, image_valid, train=train))
        detr_hs = self.detr_joiner(outputs.pop("detr_hs"))  # (L,B,Q,768)
        vl_hs = detr_hs[-1]  # (B, Q, 768)

        # frozen BERT (reference: no_grad + detach, gpv.py:142-145).
        # BERT itself is ALWAYS pad-masked (the reference tokenizer builds an
        # attention_mask, bert.py:12-21); the fusion/decode masks below are
        # where the reference differs (PARITY.md #12).
        if query_enc is None:
            query_enc = self.encode_queries(query_ids, query_valid)
        lv_hs = self.bert_joiner(query_enc)  # (B, Tl, 768)

        # mask_query_pads=True (default): batch-1 semantics — padded query
        # positions are invisible to co-attention and text decode.
        # False: the reference's BATCHED semantics (no attention masks in
        # fusion, gpv.py:149-153, and none over decode memory, gpv.py:466) —
        # outputs then depend on batch composition exactly as upstream.
        fusion_valid = query_valid if self.mask_query_pads else None

        for layer in self.co_att:
            # positional call: remat static_argnums indexes positionally
            lv_hs, vl_hs = layer(lv_hs, vl_hs, fusion_valid, None, not train)

        relevance_logits = self.relevance_predictor(vl_hs)  # (B,Q,K+1)
        outputs["pred_relevance_logits"] = (
            outputs["pred_relevance_logits"] + relevance_logits)
        if "aux_pred_relevance_logits" in outputs:
            outputs["aux_pred_relevance_logits"] = (
                outputs["aux_pred_relevance_logits"] + relevance_logits[None])

        vl_hs = self.condition_on_relevance(
            outputs["pred_relevance_logits"], vl_hs)

        memory = jnp.concatenate([vl_hs, lv_hs], axis=1)  # (B, Q+Tl, D)
        if fusion_valid is not None:
            B, Q = vl_hs.shape[:2]
            mem_valid = jnp.concatenate(
                [jnp.ones((B, Q), bool), fusion_valid], axis=1)
        else:
            mem_valid = None
        return memory, mem_valid, outputs

    def condition_on_relevance(self, relevance_logits, fused_hs):
        if not self.relevance_conditioning:
            return fused_hs
        prob = jax.nn.softmax(relevance_logits, axis=-1)  # (B,Q,2)
        tok = jnp.einsum("bqk,kd->bqd", prob,
                         self.relevance_tokens.astype(prob.dtype))
        return fused_hs + tok.astype(fused_hs.dtype)

    # ---------------- answer text machinery ----------------

    def embed_answer_tokens(self, token_ids):
        """(..., S) ids -> (..., S, D): frozen vocab embed + learned Linear."""
        emb = jnp.take(jax.lax.stop_gradient(self.vocab_embed), token_ids,
                       axis=0).astype(self.dtype)
        return self.answer_input_transform(emb)

    def answer_classifier(self):
        """(V, D) classifier matrix: learned transform of the frozen vocab
        embedding (reference AnswerHead, answer_head.py:8-33). Hoisted out
        of decode loops — recomputing it per step is ~12 GFLOPs/step waste
        (XLA does not LICM across while_loop bodies)."""
        if self.answer_head == "linear":
            return None
        return self.classifier_transform(
            jax.lax.stop_gradient(self.vocab_embed).astype(self.dtype))

    def answer_logits_head(self, h, classifier=None):
        """(..., D) decoder states -> (..., V) vocab logits."""
        if self.answer_head == "linear":
            return self.classifier(h)
        w = classifier if classifier is not None else self.answer_classifier()
        return jnp.einsum("...d,vd->...v", h, w,
                          preferred_element_type=jnp.float32)

    def decode_text(self, target_embed, memory, mem_valid=None,
                    train: bool = False):
        """Teacher-forced causal decode: (B,S,D) -> (B,S,V)."""
        if self.text_pos_enc:
            S = target_embed.shape[1]
            target_embed = target_embed + self.pos_enc_table[None, :S].astype(
                target_embed.dtype)
        h = self.text_decoder(target_embed, memory, mem_valid,
                              deterministic=not train)
        return self.answer_logits_head(h)

    # ---------------- full forward (teacher-forced training path) ----------

    def __call__(self, images, query_ids, answer_ids=None, image_valid=None,
                 query_valid=None, train: bool = False, query_enc=None):
        """Returns the reference `outputs` dict.

        With `answer_ids` (B,S): `answer_logits` is (B,S-1,V) — logits for
        positions 1..S-1 (teacher forced), matching the reference's
        `decode_text(...)[:,:,:-1]` slice (gpv.py:201).
        """
        memory, mem_valid, outputs = self.encode(
            images, query_ids, image_valid, query_valid, train,
            query_enc=query_enc)
        if answer_ids is not None:
            target = self.embed_answer_tokens(answer_ids)
            logits = self.decode_text(target, memory, mem_valid, train)
            outputs["answer_logits"] = logits[:, :-1]
        outputs["memory"] = memory
        if mem_valid is not None:
            outputs["memory_valid"] = mem_valid
        return outputs

    # ---------------- incremental decode hooks (driven by gpv_tpu.decode) ---

    def precompute_text_memory(self, memory):
        """Loop-invariant decode state: per-layer cross-attention K/V plus
        the answer classifier matrix, computed once per decode."""
        return (self.text_decoder.precompute_memory(memory),
                self.answer_classifier())

    def text_step(self, token_t, mem_state, mem_valid, caches, t,
                  beam_group: int = 1):
        """One decode step: (B,) token ids at position t -> (B,V) logits.

        beam_group: static K>1 for beam decoding — token_t/caches hold B*K
        sample-major rows while mem_state/mem_valid stay UNTILED at (B,·)
        (the K beams share cross-attention K/V; see TextDecoderLayer.step).

        Returns (logits, new_caches).
        """
        mem_kvs, classifier = mem_state
        x_t = self.embed_answer_tokens(token_t[:, None])  # (B,1,D)
        if self.text_pos_enc:
            x_t = x_t + jax.lax.dynamic_slice_in_dim(
                self.pos_enc_table, t, 1, axis=0)[None].astype(x_t.dtype)
        y, caches = self.text_decoder.step(x_t, mem_kvs, mem_valid, caches, t,
                                           beam_group=beam_group)
        return self.answer_logits_head(y[:, 0], classifier), caches

    def init_text_cache(self, batch: int):
        return self.text_decoder.init_cache(batch, self.max_text_len)


_BACKBONE_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                    "resnet152": (3, 8, 36, 3), "resnet26": (2, 2, 2, 2),
                    "resnet14": (1, 1, 1, 1)}


def _check_co_att(cfg):
    """Map the ViLBERT co_att schema onto CoAttentionLayer kwargs.

    The reference routes stream1 (text in GPV's call order) through the
    'v_*' weights and stream2 through the plain ones (vilbert.py:827-900,
    an upstream quirk GPV inherits); the mapping below preserves it.
    Structural unties (per-stream hidden sizes) are not representable and
    raise instead of being silently ignored.
    """
    co = cfg.co_att
    hd = int(cfg.hidden_dim)
    for key in ("bi_hidden_size", "hidden_size", "v_hidden_size",
                "output_size", "v_output_size"):
        val = co.get(key)
        if val is not None and int(val) != hd:
            raise ValueError(
                f"model.co_att.{key}={val} != model.hidden_dim={hd}: untied "
                "co-attention stream widths are not supported (GPV always "
                "ties them — reference configs/exp/gpv.yaml interpolations)")
    for key in ("hidden_act", "v_hidden_act"):
        act = co.get(key, "gelu")
        if act not in ("gelu", "relu", "swish"):
            raise ValueError(f"model.co_att.{key}={act!r}: unsupported "
                             "co-attention activation (gelu/relu/swish)")
    dflt = float(cfg.detr.dropout)
    extra = dict(
        intermediate2=int(co.get("intermediate_size", 3072)),
        dropout2=float(co.get("hidden_dropout_prob", dflt)),
        attn_dropout=float(co.get("v_attention_probs_dropout_prob", dflt)),
        attn_dropout2=float(co.get("attention_probs_dropout_prob", dflt)),
        act=str(co.get("v_hidden_act", "gelu")),
        act2=str(co.get("hidden_act", "gelu")),
        dropout=float(co.get("v_hidden_dropout_prob", dflt)),
    )
    intermediate = int(co.get("v_intermediate_size",
                              co.get("intermediate_size", 3072)))
    return intermediate, extra


def build_gpv(cfg, vocab_size: int, dtype=jnp.float32,
              remat: bool = False) -> GPV:
    """Build from the `model` config node (configs/exp/gpv.yaml schema)."""
    if cfg.detr.get("masks"):
        raise ValueError(
            "model.detr.masks=True (DETR segmentation head) is not part of "
            "GPV (the reference never trains it; detr.py builds DETRsegm "
            "only for panoptic) — unsupported here")
    if cfg.detr.get("frozenbatchnorm", True) is False:
        raise ValueError(
            "model.detr.frozenbatchnorm=False is not supported: the "
            "backbone is built around FrozenBN (reference backbone.py "
            "always freezes BN for GPV; serving-path BN folding depends "
            "on it)")
    backbone = str(cfg.detr.get("backbone", "resnet50"))
    if backbone not in _BACKBONE_LAYERS:
        raise ValueError(f"model.detr.backbone={backbone!r} not supported "
                         f"(one of {sorted(_BACKBONE_LAYERS)})")
    pe = str(cfg.detr.get("position_embedding", "sine"))
    if pe not in ("sine", "v2", "learned", "v3"):
        # fail at build, not first forward (reference builder behavior,
        # position_encoding.py:86-87)
        raise ValueError(f"model.detr.position_embedding={pe!r} not "
                         "supported (sine/v2 or learned/v3)")
    if cfg.roi_head and not cfg.detr.last_layer_only:
        # this combination crashes the reference in training:
        # torch.cat((roi_features, hs), -1) with (1,B,Q,2048) vs (L,B,Q,256)
        # (exp/gpv/models/detr_roi_head.py:81-92); reject it loudly instead
        # of silently training different semantics (PARITY.md #1)
        raise ValueError(
            "model.roi_head=True with detr.last_layer_only=False is not a "
            "trainable configuration (it crashes the reference at "
            "detr_roi_head.py:90-92); set last_layer_only=True or "
            "roi_head=False")
    detr_cfg = dict(
        num_queries=cfg.detr.num_queries,
        num_classes=cfg.detr.num_classes,
        hidden_dim=cfg.detr.hidden_dim,
        nheads=cfg.detr.nheads,
        num_encoder_layers=cfg.detr.num_encoder_layers,
        num_decoder_layers=cfg.detr.num_decoder_layers,
        dim_feedforward=cfg.detr.dim_feedforward,
        dropout=cfg.detr.dropout,
        dilation=cfg.detr.dilation,
        last_layer_only=cfg.detr.last_layer_only,
        aux_loss=cfg.detr.aux_loss,
        position_embedding=str(cfg.detr.get("position_embedding", "sine")),
        pre_norm=bool(cfg.detr.get("pre_norm", False)),
        # serving-graph stem rewrite (ops/stem_s2d.py); pair with
        # apply_stem_s2d on the params — measured slower on v5e
        # (BASELINE.md "r4 space-to-depth stem"), kept for other hw
        stem_s2d=bool(cfg.detr.get("stem_s2d", False)),
    )
    if cfg.detr.get("backbone_layers"):
        # explicit block spec (tests / custom depths) wins over the name
        detr_cfg["backbone_layers"] = tuple(
            int(x) for x in cfg.detr.backbone_layers)
    elif backbone != "resnet50":
        detr_cfg["backbone_layers"] = _BACKBONE_LAYERS[backbone]
    bert_cfg = cfg.get("bert") or {}
    co_att_intermediate, co_att_extra = _check_co_att(cfg)
    if cfg.co_att.get("visualization"):
        raise ValueError(
            "model.co_att.visualization=True (return attention-probability "
            "maps from fusion, vilbert.py:786-800) is not implemented; "
            "unset it rather than silently losing the diagnostics")
    hd = int(cfg.hidden_dim)
    td_hidden = int(cfg.text_decoder.get("hidden_dim", hd))
    if td_hidden != hd:
        raise ValueError(
            f"model.text_decoder.hidden_dim={td_hidden} != "
            f"model.hidden_dim={hd}: the decoder width is tied to the "
            "fusion width (reference gpv.yaml interpolation)")
    # joiner dims: flax infers input widths from data, so a wrong value
    # here would otherwise be silently ignored (upstream it sizes the
    # nn.Linear and crashes on mismatch, gpv.py:90-95)
    exp_detr_dim = int(cfg.detr.hidden_dim) + (2048 if cfg.roi_head else 0)
    joiner = cfg.get("detr_joiner") or {}
    jd = joiner.get("detr_dim")
    if jd is not None and int(jd) != exp_detr_dim:
        raise ValueError(
            f"model.detr_joiner.detr_dim={jd} but the DETR stream emits "
            f"{exp_detr_dim} features (detr.hidden_dim"
            f"{' + 2048 RoI' if cfg.roi_head else ''})")
    for node, key, want, why in (
            ("detr_joiner", "out_dim", hd, "fusion width"),
            ("bert_joiner", "out_dim", hd, "fusion width"),
            ("bert_joiner", "bert_dim",
             int((cfg.get("bert") or {}).get("hidden", 768)),
             "BERT hidden size")):
        val = (cfg.get(node) or {}).get(key)
        if val is not None and int(val) != want:
            raise ValueError(f"model.{node}.{key}={val} != {want} "
                             f"({why})")
    return GPV(
        vocab_size=vocab_size,
        hidden_dim=cfg.hidden_dim,
        max_text_len=cfg.max_text_len,
        max_pos_enc_len=cfg.max_pos_enc_len,
        text_pos_enc=cfg.text_decoder.pos_enc,
        relevance_conditioning=cfg.relevance_conditioning,
        mask_query_pads=bool(cfg.get("mask_query_pads", True)),
        answer_head=cfg.answer_head,
        co_att_num_layers=cfg.co_att.num_layers,
        co_att_heads=cfg.co_att.bi_num_attention_heads,
        co_att_intermediate=co_att_intermediate,
        co_att_extra=co_att_extra,
        dropout=cfg.detr.dropout,
        text_decoder_layers=cfg.text_decoder.num_layers,
        text_decoder_heads=cfg.text_decoder.nheads,
        text_decoder_dropout=float(
            cfg.text_decoder.get("dropout", cfg.detr.dropout)),
        detr_cfg=detr_cfg,
        roi_head=cfg.roi_head,
        bert_layers=int(bert_cfg.get("num_layers", 12)),
        bert_hidden=int(bert_cfg.get("hidden", 768)),
        bert_heads=int(bert_cfg.get("heads", 12)),
        bert_vocab_size=int(bert_cfg.get("vocab_size", 30522)),
        bert_max_len=int(bert_cfg.get("max_len", 512)),
        remat=remat,
        dtype=dtype)
