"""END-TO-END numerical parity: a torch replica of the complete GPV forward
(built from the published architecture, test-only) vs the flax model running
converted weights. This is the strongest checkpoint-parity guarantee short
of the released weights themselves: if this passes, a reference state dict
that loads here produces the same boxes / relevance / answer logits.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpv_tpu.models.gpv import GPV
from gpv_tpu.train.checkpoint import convert_gpv_torch

D = 32          # hidden (both streams, text decoder, co-attention)
DD = 32         # detr transformer dim
HEADS = 4
Q = 10          # queries
VOCAB = 40
BLOCKS = (1, 1, 1, 1)
ENC = DEC = 2
FFN = 64
BERT_L = 2
IMG_H, IMG_W = 64, 96


# --------------------------------------------------------------------------
# torch replica modules (spec: reference exp/gpv/models/*, test-only)
# --------------------------------------------------------------------------

class FrozenBN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.register_buffer("weight", torch.rand(c) + 0.5)
        self.register_buffer("bias", torch.randn(c) * 0.1)
        self.register_buffer("running_mean", torch.randn(c) * 0.1)
        self.register_buffer("running_var", torch.rand(c) + 0.5)

    def forward(self, x):
        scale = self.weight * (self.running_var + 1e-5).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class Bottleneck(tnn.Module):
    def __init__(self, in_c, planes, stride):
        super().__init__()
        out_c = planes * 4
        self.conv1 = tnn.Conv2d(in_c, planes, 1, bias=False)
        self.bn1 = FrozenBN(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = FrozenBN(planes)
        self.conv3 = tnn.Conv2d(planes, out_c, 1, bias=False)
        self.bn3 = FrozenBN(out_c)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, out_c, 1, stride=stride, bias=False),
                FrozenBN(out_c))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + idt)


class ResNetTorch(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBN(64)
        in_c = 64
        for i, (n, p) in enumerate(zip(BLOCKS, (64, 128, 256, 512))):
            blocks = []
            for b in range(n):
                blocks.append(Bottleneck(in_c if b == 0 else p * 4, p,
                                         (1 if i == 0 else 2) if b == 0
                                         else 1))
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            in_c = p * 4

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x  # (B, 2048, h, w)


def sine_pos_2d(h, w, d):
    """Reference PositionEmbeddingSine (normalized, all-valid mask)."""
    not_mask = np.ones((1, h, w), np.float32)
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = 10000.0 ** (2 * (np.arange(d // 2) // 2) / (d // 2))
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  -1).reshape(1, h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  -1).reshape(1, h, w, -1)
    return np.concatenate([py, px], -1)  # (1, h, w, d)


class DetrEncoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(DD, HEADS, batch_first=True)
        self.linear1 = tnn.Linear(DD, FFN)
        self.linear2 = tnn.Linear(FFN, DD)
        self.norm1 = tnn.LayerNorm(DD)
        self.norm2 = tnn.LayerNorm(DD)

    def forward(self, src, pos):
        q = k = src + pos
        a, _ = self.self_attn(q, k, src)
        src = self.norm1(src + a)
        return self.norm2(src + self.linear2(F.relu(self.linear1(src))))


class DetrDecoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(DD, HEADS, batch_first=True)
        self.multihead_attn = tnn.MultiheadAttention(DD, HEADS,
                                                     batch_first=True)
        self.linear1 = tnn.Linear(DD, FFN)
        self.linear2 = tnn.Linear(FFN, DD)
        self.norm1 = tnn.LayerNorm(DD)
        self.norm2 = tnn.LayerNorm(DD)
        self.norm3 = tnn.LayerNorm(DD)

    def forward(self, tgt, mem, qpos, pos):
        q = k = tgt + qpos
        a, _ = self.self_attn(q, k, tgt)
        tgt = self.norm1(tgt + a)
        a, _ = self.multihead_attn(tgt + qpos, mem + pos, mem)
        tgt = self.norm2(tgt + a)
        return self.norm3(tgt + self.linear2(F.relu(self.linear1(tgt))))


def roi_align_ref(feat_chw, boxes_cxcywh):
    """NumPy torchvision-semantics roi_align (from tests/test_ops.py),
    mean-pooled."""
    from test_ops import _roi_align_ref
    C, H, W = feat_chw.shape
    b = boxes_cxcywh
    xyxy = np.stack([W * (b[:, 0] - b[:, 2] / 2), H * (b[:, 1] - b[:, 3] / 2),
                     W * (b[:, 0] + b[:, 2] / 2),
                     H * (b[:, 1] + b[:, 3] / 2)], -1)
    return _roi_align_ref(feat_chw, xyxy).mean((-1, -2))  # (N, C)


class CoAttentionTorch(tnn.Module):
    """ViLBERT connection-layer replica (see test_torch_parity_detr)."""

    def __init__(self):
        super().__init__()
        for s in ("1", "2"):
            for p in ("query", "key", "value"):
                setattr(self, f"{p}{s}", tnn.Linear(D, D))
        self.dense1 = tnn.Linear(D, D)
        self.norm1 = tnn.LayerNorm(D, eps=1e-12)
        self.dense2 = tnn.Linear(D, D)
        self.norm2 = tnn.LayerNorm(D, eps=1e-12)
        self.ffn_in1 = tnn.Linear(D, FFN)
        self.ffn_out1 = tnn.Linear(FFN, D)
        self.ffn_norm1 = tnn.LayerNorm(D, eps=1e-12)
        self.ffn_in2 = tnn.Linear(D, FFN)
        self.ffn_out2 = tnn.Linear(FFN, D)
        self.ffn_norm2 = tnn.LayerNorm(D, eps=1e-12)

    def _h(self, x):
        B, T, _ = x.shape
        return x.view(B, T, HEADS, D // HEADS).permute(0, 2, 1, 3)

    def forward(self, x1, x2):
        q1, k1, v1 = (self._h(f(x1)) for f in
                      (self.query1, self.key1, self.value1))
        q2, k2, v2 = (self._h(f(x2)) for f in
                      (self.query2, self.key2, self.value2))
        dh = D // HEADS
        ctx1 = (torch.softmax(q2 @ k1.transpose(-1, -2) / dh ** 0.5, -1)
                @ v1).permute(0, 2, 1, 3).reshape(x2.shape)
        ctx2 = (torch.softmax(q1 @ k2.transpose(-1, -2) / dh ** 0.5, -1)
                @ v2).permute(0, 2, 1, 3).reshape(x1.shape)
        h1 = self.norm1(self.dense1(ctx2) + x1)
        h2 = self.norm2(self.dense2(ctx1) + x2)
        o1 = self.ffn_norm1(self.ffn_out1(F.gelu(self.ffn_in1(h1))) + h1)
        o2 = self.ffn_norm2(self.ffn_out2(F.gelu(self.ffn_in2(h2))) + h2)
        return o1, o2


class GPVTorch(tnn.Module):
    """Full torch GPV replica at tiny scale."""

    def __init__(self, hf_bert):
        super().__init__()
        self.backbone = ResNetTorch()
        self.input_proj = tnn.Conv2d(2048, DD, 1)
        self.query_embed = tnn.Embedding(Q, DD)
        self.enc = tnn.ModuleList([DetrEncoderLayer() for _ in range(ENC)])
        self.dec = tnn.ModuleList([DetrDecoderLayer() for _ in range(DEC)])
        self.dec_norm = tnn.LayerNorm(DD)
        self.class_embed = tnn.Linear(DD, 2)
        self.bbox_l0 = tnn.Linear(DD, DD)
        self.bbox_l1 = tnn.Linear(DD, DD)
        self.bbox_l2 = tnn.Linear(DD, 4)
        self.detr_joiner = tnn.Linear(2048 + DD, D)
        self.bert = hf_bert
        self.bert_joiner = tnn.Linear(D, D)
        self.co_att = tnn.ModuleList([CoAttentionTorch() for _ in range(2)])
        self.relevance_predictor = tnn.Linear(D, 2)
        layer = tnn.TransformerDecoderLayer(d_model=D, nhead=HEADS,
                                            dim_feedforward=2048,
                                            dropout=0.0)
        self.text_decoder = tnn.TransformerDecoder(layer, 2)
        self.vocab_embed = tnn.Parameter(0.1 * torch.randn(VOCAB, D),
                                         requires_grad=False)
        self.classifier_transform = tnn.Linear(D, D)
        self.answer_input_transform = tnn.Linear(D, D)
        self.relevance_tokens = tnn.Parameter(0.1 * torch.randn(2, D))

    def forward(self, images, query_ids, answer_ids):
        B = images.shape[0]
        feats = self.backbone(images)          # (B, 2048, h, w)
        h, w = feats.shape[2:]
        pos = torch.from_numpy(
            sine_pos_2d(h, w, DD).astype(np.float32))  # (1,h,w,DD)
        pos = pos.reshape(1, h * w, DD).expand(B, -1, -1)
        src = self.input_proj(feats).flatten(2).permute(0, 2, 1)  # (B,hw,DD)
        mem = src
        for layer in self.enc:
            mem = layer(mem, pos)
        qpos = self.query_embed.weight[None].expand(B, -1, -1)
        tgt = torch.zeros_like(qpos)
        for layer in self.dec:
            tgt = layer(tgt, mem, qpos, pos)
        hs = self.dec_norm(tgt)                # (B, Q, DD)
        logits = self.class_embed(hs)
        x = F.relu(self.bbox_l0(hs))
        x = F.relu(self.bbox_l1(x))
        boxes = self.bbox_l2(x).sigmoid()      # (B, Q, 4)

        roi = np.stack([
            roi_align_ref(feats[b].detach().numpy(),
                          boxes[b].detach().numpy())
            for b in range(B)])                # (B, Q, 2048)
        roi = torch.from_numpy(roi.astype(np.float32))
        roi = F.layer_norm(roi, (roi.shape[-1],))
        detr_hs = torch.cat([roi, hs], -1)     # (B, Q, 2080)

        vl = self.detr_joiner(detr_hs)
        with torch.no_grad():
            q_enc = self.bert(input_ids=query_ids)[0]
        lv = self.bert_joiner(q_enc)
        for layer in self.co_att:
            lv, vl = layer(lv, vl)
        rel = logits + self.relevance_predictor(vl)
        prob = rel.softmax(-1)                 # (B, Q, 2)
        vl = vl + prob @ self.relevance_tokens
        memory = torch.cat([vl, lv], 1)        # (B, Q+Tl, D)

        emb = self.answer_input_transform(self.vocab_embed[answer_ids])
        S = emb.shape[1]
        mask = torch.triu(torch.ones(S, S, dtype=torch.bool), 1)
        dec = self.text_decoder(emb.permute(1, 0, 2),
                                memory.permute(1, 0, 2),
                                mask).permute(1, 0, 2)
        w_cls = self.classifier_transform(self.vocab_embed)
        answer_logits = dec @ w_cls.T          # (B, S, V)
        return rel, boxes, answer_logits[:, :-1]


def reference_named_state_dict(m: GPVTorch):
    """Rename the replica's params to the reference naming scheme."""
    sd = {}
    raw = m.state_dict()

    def put(ref_name, key):
        sd[ref_name] = raw[key].numpy()

    bb = "detr.backbone.0.body"
    for k in raw:
        if k.startswith("backbone."):
            ref = k.replace("backbone.", f"{bb}.", 1)
            ref = ref.replace(".downsample.0.", ".downsample.0.")
            ref = ref.replace(".downsample.1.", ".downsample.1.")
            sd[ref] = raw[k].numpy()
    put("detr.input_proj.weight", "input_proj.weight")
    put("detr.input_proj.bias", "input_proj.bias")
    put("detr.query_embed.weight", "query_embed.weight")
    for i in range(ENC):
        for sub in ("self_attn.in_proj_weight", "self_attn.in_proj_bias",
                    "self_attn.out_proj.weight", "self_attn.out_proj.bias",
                    "linear1.weight", "linear1.bias", "linear2.weight",
                    "linear2.bias", "norm1.weight", "norm1.bias",
                    "norm2.weight", "norm2.bias"):
            put(f"detr.transformer.encoder.layers.{i}.{sub}",
                f"enc.{i}.{sub}")
    for i in range(DEC):
        for sub in ("self_attn.in_proj_weight", "self_attn.in_proj_bias",
                    "self_attn.out_proj.weight", "self_attn.out_proj.bias",
                    "multihead_attn.in_proj_weight",
                    "multihead_attn.in_proj_bias",
                    "multihead_attn.out_proj.weight",
                    "multihead_attn.out_proj.bias",
                    "linear1.weight", "linear1.bias", "linear2.weight",
                    "linear2.bias", "norm1.weight", "norm1.bias",
                    "norm2.weight", "norm2.bias", "norm3.weight",
                    "norm3.bias"):
            put(f"detr.transformer.decoder.layers.{i}.{sub}",
                f"dec.{i}.{sub}")
    put("detr.transformer.decoder.norm.weight", "dec_norm.weight")
    put("detr.transformer.decoder.norm.bias", "dec_norm.bias")
    put("detr.class_embed.weight", "class_embed.weight")
    put("detr.class_embed.bias", "class_embed.bias")
    for i, nm in enumerate(("bbox_l0", "bbox_l1", "bbox_l2")):
        put(f"detr.bbox_embed.layers.{i}.weight", f"{nm}.weight")
        put(f"detr.bbox_embed.layers.{i}.bias", f"{nm}.bias")
    put("detr_joiner.weight", "detr_joiner.weight")
    put("detr_joiner.bias", "detr_joiner.bias")
    for k in raw:
        if k.startswith("bert."):
            sd["bert.model." + k[len("bert."):]] = raw[k].numpy()
    put("bert_joiner.weight", "bert_joiner.weight")
    put("bert_joiner.bias", "bert_joiner.bias")
    for i in range(2):
        p = f"co_att_transformer.{i}"
        for s in ("1", "2"):
            for q in ("query", "key", "value"):
                put(f"{p}.biattention.{q}{s}.weight", f"co_att.{i}.{q}{s}.weight")
                put(f"{p}.biattention.{q}{s}.bias", f"co_att.{i}.{q}{s}.bias")
        put(f"{p}.biOutput.dense1.weight", f"co_att.{i}.dense1.weight")
        put(f"{p}.biOutput.dense1.bias", f"co_att.{i}.dense1.bias")
        put(f"{p}.biOutput.LayerNorm1.weight", f"co_att.{i}.norm1.weight")
        put(f"{p}.biOutput.LayerNorm1.bias", f"co_att.{i}.norm1.bias")
        put(f"{p}.biOutput.dense2.weight", f"co_att.{i}.dense2.weight")
        put(f"{p}.biOutput.dense2.bias", f"co_att.{i}.dense2.bias")
        put(f"{p}.biOutput.LayerNorm2.weight", f"co_att.{i}.norm2.weight")
        put(f"{p}.biOutput.LayerNorm2.bias", f"co_att.{i}.norm2.bias")
        put(f"{p}.v_intermediate.dense.weight", f"co_att.{i}.ffn_in1.weight")
        put(f"{p}.v_intermediate.dense.bias", f"co_att.{i}.ffn_in1.bias")
        put(f"{p}.v_output.dense.weight", f"co_att.{i}.ffn_out1.weight")
        put(f"{p}.v_output.dense.bias", f"co_att.{i}.ffn_out1.bias")
        put(f"{p}.v_output.LayerNorm.weight", f"co_att.{i}.ffn_norm1.weight")
        put(f"{p}.v_output.LayerNorm.bias", f"co_att.{i}.ffn_norm1.bias")
        put(f"{p}.t_intermediate.dense.weight", f"co_att.{i}.ffn_in2.weight")
        put(f"{p}.t_intermediate.dense.bias", f"co_att.{i}.ffn_in2.bias")
        put(f"{p}.t_output.dense.weight", f"co_att.{i}.ffn_out2.weight")
        put(f"{p}.t_output.dense.bias", f"co_att.{i}.ffn_out2.bias")
        put(f"{p}.t_output.LayerNorm.weight", f"co_att.{i}.ffn_norm2.weight")
        put(f"{p}.t_output.LayerNorm.bias", f"co_att.{i}.ffn_norm2.bias")
    put("relevance_predictor.weight", "relevance_predictor.weight")
    put("relevance_predictor.bias", "relevance_predictor.bias")
    for k in raw:
        if k.startswith("text_decoder."):
            sd[k] = raw[k].numpy()
    sd["answer_head.vocab_embed"] = raw["vocab_embed"].numpy()
    put("answer_head.classifier_transform.weight",
        "classifier_transform.weight")
    put("answer_head.classifier_transform.bias",
        "classifier_transform.bias")
    put("answer_input_embedings.transform.weight",
        "answer_input_transform.weight")
    put("answer_input_embedings.transform.bias",
        "answer_input_transform.bias")
    sd["vision_token"] = np.zeros(D, np.float32)
    sd["lang_token"] = np.zeros(D, np.float32)
    sd["relevance_tokens"] = raw["relevance_tokens"].numpy()
    return sd


class TestFullGpvParity:
    def test_end_to_end_forward(self):
        torch.manual_seed(0)
        from transformers import BertConfig, BertModel
        hf_bert = BertModel(BertConfig(
            vocab_size=50, hidden_size=D, num_hidden_layers=BERT_L,
            num_attention_heads=HEADS, intermediate_size=4 * D,
            max_position_embeddings=16, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0))
        tm = GPVTorch(hf_bert).eval()

        B, Tq, S = 2, 6, 7
        images = torch.randn(B, 3, IMG_H, IMG_W)
        qids = torch.randint(0, 50, (B, Tq))
        aids = torch.randint(0, VOCAB, (B, S))
        with torch.no_grad():
            rel_t, boxes_t, ans_t = tm(images, qids, aids)

        sd = reference_named_state_dict(tm)
        converted = convert_gpv_torch(
            sd, num_co_att=2, text_dec_layers=2, hidden=D,
            detr_layers=BLOCKS, detr_dim=DD, detr_enc=ENC, detr_dec=DEC,
            bert_layers=BERT_L)

        detr_cfg = dict(num_queries=Q, num_classes=1, hidden_dim=DD,
                        nheads=HEADS, num_encoder_layers=ENC,
                        num_decoder_layers=DEC, dim_feedforward=FFN,
                        dropout=0.0, backbone_layers=BLOCKS)
        model = GPV(vocab_size=VOCAB, hidden_dim=D, max_text_len=S,
                    co_att_num_layers=2, co_att_heads=HEADS,
                    co_att_intermediate=FFN, dropout=0.0,
                    text_decoder_layers=2, text_decoder_heads=HEADS,
                    detr_cfg=detr_cfg, bert_layers=BERT_L, bert_hidden=D,
                    bert_heads=HEADS, bert_vocab_size=50, bert_max_len=16)
        variables = {"params": jax.tree.map(jnp.asarray,
                                            converted["params"]),
                     "batch_stats": jax.tree.map(jnp.asarray,
                                                 converted["batch_stats"])}
        out = model.apply(variables,
                          jnp.asarray(images.permute(0, 2, 3, 1).numpy()),
                          jnp.asarray(qids.numpy()),
                          jnp.asarray(aids.numpy()), train=False)

        np.testing.assert_allclose(np.asarray(out["pred_boxes"]),
                                   boxes_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["pred_relevance_logits"]), rel_t.numpy(),
            atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["answer_logits"]),
                                   ans_t.numpy(), atol=2e-3)
