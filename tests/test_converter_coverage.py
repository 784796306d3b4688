"""Full-model converter coverage: a synthetic torch state dict with the
reference's exact parameter naming converts into a tree whose structure and
shapes match `GPV.init` exactly — catching any naming/layout drift beyond
the per-module numerical parity tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.models.gpv import GPV
from gpv_tpu.train.checkpoint import convert_gpv_torch

V, D = 60, 768
BERT_V, BERT_L = 30522, 12
RESNET = {"layer1": (3, 64, 256), "layer2": (4, 128, 512),
          "layer3": (6, 256, 1024), "layer4": (3, 512, 2048)}


def synth_reference_state_dict():
    """Reference GPV parameter names with correct shapes (random data)."""
    sd = {}
    rng = np.random.RandomState(0)

    def add(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    def add_bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    def add_linear(prefix, out_d, in_d):
        add(f"{prefix}.weight", out_d, in_d)
        add(f"{prefix}.bias", out_d)

    def add_mha(prefix, d):
        add(f"{prefix}.in_proj_weight", 3 * d, d)
        add(f"{prefix}.in_proj_bias", 3 * d)
        add_linear(f"{prefix}.out_proj", d, d)

    def add_ln(prefix, d):
        add(f"{prefix}.weight", d)
        add(f"{prefix}.bias", d)

    # --- DETR backbone (torchvision resnet50 naming) ---
    bb = "detr.backbone.0.body"
    add(f"{bb}.conv1.weight", 64, 3, 7, 7)
    add_bn(f"{bb}.bn1", 64)
    in_c = 64
    for lname, (blocks, planes, out_c) in RESNET.items():
        for b in range(blocks):
            p = f"{bb}.{lname}.{b}"
            add(f"{p}.conv1.weight", planes, in_c if b == 0 else out_c, 1, 1)
            add_bn(f"{p}.bn1", planes)
            add(f"{p}.conv2.weight", planes, planes, 3, 3)
            add_bn(f"{p}.bn2", planes)
            add(f"{p}.conv3.weight", out_c, planes, 1, 1)
            add_bn(f"{p}.bn3", out_c)
            if b == 0:
                add(f"{p}.downsample.0.weight", out_c,
                    in_c if b == 0 else out_c, 1, 1)
                add_bn(f"{p}.downsample.1", out_c)
        in_c = out_c

    # --- DETR transformer / heads ---
    add("detr.input_proj.weight", 256, 2048, 1, 1)
    add("detr.input_proj.bias", 256)
    add("detr.query_embed.weight", 100, 256)
    for i in range(6):
        p = f"detr.transformer.encoder.layers.{i}"
        add_mha(f"{p}.self_attn", 256)
        add_linear(f"{p}.linear1", 2048, 256)
        add_linear(f"{p}.linear2", 256, 2048)
        add_ln(f"{p}.norm1", 256)
        add_ln(f"{p}.norm2", 256)
    for i in range(6):
        p = f"detr.transformer.decoder.layers.{i}"
        add_mha(f"{p}.self_attn", 256)
        add_mha(f"{p}.multihead_attn", 256)
        add_linear(f"{p}.linear1", 2048, 256)
        add_linear(f"{p}.linear2", 256, 2048)
        for j in (1, 2, 3):
            add_ln(f"{p}.norm{j}", 256)
    add_ln("detr.transformer.decoder.norm", 256)
    add_linear("detr.class_embed", 2, 256)
    for i, (ind, outd) in enumerate(((256, 256), (256, 256), (256, 4))):
        add_linear(f"detr.bbox_embed.layers.{i}", outd, ind)

    add_linear("detr_joiner", D, 2304)

    # --- BERT (HF naming under bert.model.) ---
    be = "bert.model.embeddings"
    add(f"{be}.word_embeddings.weight", BERT_V, D)
    add(f"{be}.position_embeddings.weight", 512, D)
    add(f"{be}.token_type_embeddings.weight", 2, D)
    add_ln(f"{be}.LayerNorm", D)
    for i in range(BERT_L):
        p = f"bert.model.encoder.layer.{i}"
        for q in ("query", "key", "value"):
            add_linear(f"{p}.attention.self.{q}", D, D)
        add_linear(f"{p}.attention.output.dense", D, D)
        add_ln(f"{p}.attention.output.LayerNorm", D)
        add_linear(f"{p}.intermediate.dense", 3072, D)
        add_linear(f"{p}.output.dense", D, 3072)
        add_ln(f"{p}.output.LayerNorm", D)

    add_linear("bert_joiner", D, D)

    # --- co-attention ---
    for i in range(3):
        p = f"co_att_transformer.{i}"
        for s in ("1", "2"):
            for q in ("query", "key", "value"):
                add_linear(f"{p}.biattention.{q}{s}", D, D)
        add_linear(f"{p}.biOutput.dense1", D, D)
        add_ln(f"{p}.biOutput.LayerNorm1", D)
        add_linear(f"{p}.biOutput.q_dense1", D, D)  # unused by forward
        add_linear(f"{p}.biOutput.dense2", D, D)
        add_ln(f"{p}.biOutput.LayerNorm2", D)
        add_linear(f"{p}.biOutput.q_dense2", D, D)  # unused by forward
        add_linear(f"{p}.v_intermediate.dense", 3072, D)
        add_linear(f"{p}.v_output.dense", D, 3072)
        add_ln(f"{p}.v_output.LayerNorm", D)
        add_linear(f"{p}.t_intermediate.dense", 3072, D)
        add_linear(f"{p}.t_output.dense", D, 3072)
        add_ln(f"{p}.t_output.LayerNorm", D)

    add_linear("relevance_predictor", 2, D)

    for i in range(3):
        p = f"text_decoder.layers.{i}"
        add_mha(f"{p}.self_attn", D)
        add_mha(f"{p}.multihead_attn", D)
        add_linear(f"{p}.linear1", 2048, D)
        add_linear(f"{p}.linear2", D, 2048)
        for j in (1, 2, 3):
            add_ln(f"{p}.norm{j}", D)

    add("answer_head.vocab_embed", V, D)
    add_linear("answer_head.classifier_transform", D, D)
    add_linear("answer_input_embedings.transform", D, D)
    add("vision_token", D)
    add("lang_token", D)
    add("relevance_tokens", 2, D)
    return sd


def tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(tree_spec(v, path))
        else:
            out[path] = tuple(getattr(v, "shape", np.shape(v)))
    return out


class TestConverterCoverage:
    def test_full_model_structure_and_shapes(self):
        sd = {f"module.{k}": v for k, v in
              synth_reference_state_dict().items()}  # DDP prefix too
        converted = convert_gpv_torch(sd)

        detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256,
                        nheads=8, num_encoder_layers=6, num_decoder_layers=6,
                        dim_feedforward=2048, dropout=0.1)
        model = GPV(vocab_size=V, detr_cfg=detr_cfg)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 4), jnp.int32),
                               jnp.zeros((1, 4), jnp.int32), train=False))
        want_p = tree_spec(variables["params"])
        got_p = tree_spec(converted["params"])
        missing = sorted(set(want_p) - set(got_p))
        extra = sorted(set(got_p) - set(want_p))
        assert not missing, f"converter missing params: {missing[:10]}"
        assert not extra, f"converter extra params: {extra[:10]}"
        for k in want_p:
            assert tuple(want_p[k]) == tuple(got_p[k]), \
                f"shape mismatch at {k}: {want_p[k]} vs {got_p[k]}"

        want_s = tree_spec(variables["batch_stats"])
        got_s = tree_spec(converted["batch_stats"])
        assert set(want_s) == set(got_s)
        for k in want_s:
            assert tuple(want_s[k]) == tuple(got_s[k])


# ---------------------------------------------------------------------------
# torchvision ImageNet ResNet-50 (raw `resnet50().state_dict()` naming) —
# the from-scratch recipe when no DETR checkpoint exists
# ---------------------------------------------------------------------------

def synth_torchvision_resnet50_state_dict():
    """Raw torchvision resnet50 parameter names with the real shapes,
    including the keys the converter must ignore (fc head,
    num_batches_tracked)."""
    sd = {}
    rng = np.random.RandomState(1)

    def add(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    def add_bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    add("conv1.weight", 64, 3, 7, 7)
    add_bn("bn1", 64)
    in_c = 64
    for lname, (blocks, planes, out_c) in RESNET.items():
        for b in range(blocks):
            p = f"{lname}.{b}"
            add(f"{p}.conv1.weight", planes, in_c if b == 0 else out_c, 1, 1)
            add_bn(f"{p}.bn1", planes)
            add(f"{p}.conv2.weight", planes, planes, 3, 3)
            add_bn(f"{p}.bn2", planes)
            add(f"{p}.conv3.weight", out_c, planes, 1, 1)
            add_bn(f"{p}.bn3", out_c)
            if b == 0:
                add(f"{p}.downsample.0.weight", out_c, in_c, 1, 1)
                add_bn(f"{p}.downsample.1", out_c)
        in_c = out_c
    add("fc.weight", 1000, 2048)
    add("fc.bias", 1000)
    return sd


class TestTorchvisionBackboneConverter:
    def _variables(self):
        detr_cfg = dict(num_queries=10, num_classes=1, hidden_dim=32,
                        nheads=4, num_encoder_layers=1, num_decoder_layers=1,
                        dim_feedforward=64, dropout=0.0)
        model = GPV(vocab_size=V, hidden_dim=32, co_att_num_layers=1,
                    co_att_heads=4, co_att_intermediate=64,
                    text_decoder_layers=1, text_decoder_heads=4,
                    detr_cfg=detr_cfg, bert_layers=1, bert_hidden=32,
                    bert_heads=4, bert_vocab_size=50)
        # these tests only need the STRUCTURE (shapes) plus distinguishable
        # concrete values; eval_shape traces without compiling/executing the
        # init graph (~30 s saved on the 1-vCPU suite)
        spec = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 4), jnp.int32),
                               jnp.zeros((1, 4), jnp.int32), train=False))
        rng = np.random.RandomState(7)
        return jax.tree.map(
            lambda s: rng.standard_normal(s.shape).astype(s.dtype), spec)

    def test_structure_covers_flax_backbone_exactly(self):
        from gpv_tpu.train.checkpoint import convert_torchvision_resnet50

        params, stats = convert_torchvision_resnet50(
            synth_torchvision_resnet50_state_dict())
        variables = self._variables()
        want_p = tree_spec(variables["params"]["detr"]["backbone"])
        got_p = tree_spec(params)
        assert set(want_p) == set(got_p), (
            f"missing={sorted(set(want_p) - set(got_p))[:8]} "
            f"extra={sorted(set(got_p) - set(want_p))[:8]}")
        for k in want_p:
            assert tuple(want_p[k]) == tuple(got_p[k]), k
        want_s = tree_spec(variables["batch_stats"]["detr"]["backbone"])
        got_s = tree_spec(stats)
        assert set(want_s) == set(got_s)
        for k in want_s:
            assert tuple(want_s[k]) == tuple(got_s[k]), k

    def test_load_imagenet_backbone_merges_only_backbone(self, tmp_path):
        torch = pytest.importorskip("torch")

        from gpv_tpu.train.checkpoint import load_imagenet_backbone

        sd = synth_torchvision_resnet50_state_dict()
        path = tmp_path / "resnet50.pth"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   path)

        variables = self._variables()
        before_proj = np.asarray(
            variables["params"]["detr"]["input_proj"]["kernel"]).copy()
        out = load_imagenet_backbone(variables, path)

        got = np.asarray(out["params"]["detr"]["backbone"]["conv1"]["kernel"])
        want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(got, want)
        got_var = np.asarray(
            out["batch_stats"]["detr"]["backbone"]["layer3"]["block2"]
               ["bn2"]["running_var"])
        np.testing.assert_array_equal(got_var,
                                      sd["layer3.2.bn2.running_var"])
        # non-backbone params untouched
        np.testing.assert_array_equal(
            np.asarray(out["params"]["detr"]["input_proj"]["kernel"]),
            before_proj)
