"""Checkpointing: orbax save/restore + torch-checkpoint conversion.

Behavior spec (SURVEY.md §5): reference keeps a single `ckpts/model.pth`
torch.save dict {model, optimizer, epoch, step, lr, model_selection_metric,
warmup_scheduler} written only on selection-metric improvement
(`exp/gpv/train_distr.py:386-394`), with three load paths:
  (1) DETR-only init by key-prefix/shape match (`gpv.py:122-135`),
  (2) trainer resume with shape-checked partial load (`train_distr.py:264-273`),
  (3) eval/inference load that strips the DDP 'module.' prefix.
Here: orbax for native checkpoints (model/opt/step/epoch/metric), plus a
torch->flax converter that understands the reference's parameter naming
(including DDP prefixes) so released GPV checkpoints load directly.
"""
from __future__ import annotations

import threading
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


# --------------------------------------------------------------------------
# orbax native checkpoints
# --------------------------------------------------------------------------

def _checkpointer(async_write: bool = False):
    """Rank-0-only orbax checkpointer.

    The trainer gates save/restore to rank 0 (the reference's torch.save
    rank gating, train_distr.py:386-394); orbax's default barrier expects
    EVERY process to call save, which would deadlock a rank-0-only call on
    a multi-process cluster. Restrict the active set to this process — the
    payload is host numpy (fully-replicated values), so no other process's
    data is needed.

    async_write: an `ocp.AsyncCheckpointer` whose save() returns as soon as
    the (already host-resident) payload is handed to the writer thread —
    training overlaps the disk write. Join via `wait_for_saves()`.
    """
    import orbax.checkpoint as ocp
    kw = {}
    if jax.process_count() > 1:
        kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=jax.process_index(),
            active_processes={jax.process_index()})
    if async_write:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler(), **kw)
    if kw:
        return ocp.Checkpointer(ocp.StandardCheckpointHandler(), **kw)
    return ocp.StandardCheckpointer()


# async saves in flight: final path -> (ckptr, tmp_path, final_path, meta).
# Joined before any new save/restore touches the same path, and by trainer
# shutdown. The write lands in tmp_path; the PREVIOUS checkpoint at
# final_path stays intact until _finalize swaps the completed write in —
# a preemption mid-write can never leave zero checkpoints on disk.
_INFLIGHT: Dict[str, Any] = {}
_INFLIGHT_LOCK = threading.Lock()


def _finalize(entry):
    """Join a checkpoint write, then atomically publish it.

    Order matters: (1) wait for the payload to be fully on disk in the tmp
    dir, (2) replace the old checkpoint with a rename (the only
    no-checkpoint window is the instant between rmtree and rename),
    (3) write meta.json LAST so metadata never describes an uncommitted
    payload. The checkpointer is close()d regardless (orbax async
    checkpointers own worker threads)."""
    import json
    import shutil
    ckptr, tmp, path, metadata = entry
    try:
        if hasattr(ckptr, "wait_until_finished"):
            ckptr.wait_until_finished()
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        (path.parent / f"{path.name}.meta.json").write_text(
            json.dumps(metadata, default=float))
    finally:
        close = getattr(ckptr, "close", None)
        if close is not None:
            close()


def wait_for_saves(path=None):
    """Block until pending async checkpoint writes finish and publish.

    path=None joins ALL in-flight saves (trainer end / process exit);
    otherwise only the save targeting that path. A failed write raises
    here but never poisons later saves: the in-flight entry is dropped
    regardless (the previous checkpoint at the final path survives).
    """
    with _INFLIGHT_LOCK:
        if path is None:
            pending = list(_INFLIGHT.items())
        else:
            key = str(Path(path).resolve())
            pending = [(key, _INFLIGHT[key])] if key in _INFLIGHT else []
    for key, entry in pending:
        try:
            _finalize(entry)
        finally:
            with _INFLIGHT_LOCK:
                if _INFLIGHT.get(key) is entry:
                    del _INFLIGHT[key]


def _host_value(x):
    """Fetch a (possibly global, fully-replicated) array to host numpy."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if not x.sharding.is_fully_replicated:
            # one process holds only its shards of a cross-host sharded
            # array: addressable_data(0) would silently return a TRUNCATED
            # value (corrupt checkpoint / eval weights). The trainer rejects
            # multi-host TP up front (validate_multihost_mesh); this guards
            # any other path that reaches here.
            raise ValueError(
                f"cannot materialize non-replicated global array "
                f"(sharding {x.sharding}) on a single host; gather it "
                "across processes first")
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def save_checkpoint(ckpt_dir: str | Path, state, metadata: Dict[str, Any],
                    name: str = "model", async_write: bool = False) -> Path:
    """Write state+metadata under ckpt_dir/name.

    The payload lands in a sibling tmp dir first; the previous checkpoint
    at ckpt_dir/name is replaced only once the write is complete
    (`_finalize`), and meta.json is written after the payload commits —
    a crash/preemption mid-write always leaves the previous checkpoint
    loadable. async_write=True returns once the host-resident payload is
    handed to orbax's writer thread (the device->host fetch below is
    synchronous either way — the next train step may donate these
    buffers); the swap happens at `wait_for_saves()` / the next IO on
    this path.
    """
    path = Path(ckpt_dir).resolve() / name
    wait_for_saves(path)  # never two writers on one path
    ckptr = _checkpointer(async_write)
    payload = {
        "params": jax.tree.map(_host_value, state.params),
        "batch_stats": jax.tree.map(_host_value, state.batch_stats),
        "opt_state": jax.tree.map(_host_value, state.opt_state),
        "step": int(_host_value(state.step)),
    }
    tmp = path.with_name(f".{name}.writing")
    if tmp.exists():  # stale tmp from a preempted earlier run
        import shutil
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)
    entry = (ckptr, tmp, path, dict(metadata))
    if async_write:
        with _INFLIGHT_LOCK:
            _INFLIGHT[str(path)] = entry
    else:
        _finalize(entry)
    return path


def restore_checkpoint(ckpt_dir: str | Path, state=None,
                       name: str = "model"):
    import json
    path = Path(ckpt_dir).resolve() / name
    wait_for_saves(path)  # a just-issued async save must land first
    ckptr = _checkpointer()
    if state is not None:
        target = {
            "params": jax.tree.map(_host_value, state.params),
            "batch_stats": jax.tree.map(_host_value, state.batch_stats),
            "opt_state": jax.tree.map(_host_value, state.opt_state),
            "step": int(_host_value(state.step)),
        }
        payload = ckptr.restore(path, target)
    else:
        payload = ckptr.restore(path)
    meta_path = Path(ckpt_dir) / f"{name}.meta.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return payload, metadata


# --------------------------------------------------------------------------
# torch -> flax conversion (for the released reference checkpoints)
# --------------------------------------------------------------------------

def _set(tree: dict, path: list[str], value: np.ndarray):
    cur = tree
    for k in path[:-1]:
        cur = cur.setdefault(k, {})
    cur[path[-1]] = value


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip the DDP 'module.' prefix (reference inference.py:57-62)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return _strip_prefix({k: v.numpy() if hasattr(v, "numpy") else
                          np.asarray(v) for k, v in sd.items()})


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _linear(tree, flax_path, sd, torch_name):
    _set(tree, flax_path + ["kernel"], sd[f"{torch_name}.weight"].T)
    if f"{torch_name}.bias" in sd:
        _set(tree, flax_path + ["bias"], sd[f"{torch_name}.bias"])


def _layernorm(tree, flax_path, sd, torch_name):
    _set(tree, flax_path + ["scale"], sd[f"{torch_name}.weight"])
    _set(tree, flax_path + ["bias"], sd[f"{torch_name}.bias"])


def _mha(tree, flax_path, sd, torch_name, dim):
    """torch nn.MultiheadAttention packed in_proj -> separate q/k/v/out."""
    w = sd[f"{torch_name}.in_proj_weight"]
    b = sd[f"{torch_name}.in_proj_bias"]
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        _set(tree, flax_path + [name, "kernel"],
             w[i * dim:(i + 1) * dim].T)
        _set(tree, flax_path + [name, "bias"], b[i * dim:(i + 1) * dim])
    _linear(tree, flax_path + ["out_proj"], sd, f"{torch_name}.out_proj")


def _frozen_bn(params, stats, flax_path, sd, torch_name):
    for k in ("weight", "bias", "running_mean", "running_var"):
        _set(stats, flax_path + [k], sd[f"{torch_name}.{k}"])


def _resnet_bottleneck(params, stats, base, sd, tname):
    for i in (1, 2, 3):
        _set(params, base + [f"conv{i}", "kernel"],
             _conv_kernel(sd[f"{tname}.conv{i}.weight"]))
        _frozen_bn(params, stats, base + [f"bn{i}"], sd, f"{tname}.bn{i}")
    if f"{tname}.downsample.0.weight" in sd:
        _set(params, base + ["downsample_conv", "kernel"],
             _conv_kernel(sd[f"{tname}.downsample.0.weight"]))
        _frozen_bn(params, stats, base + ["downsample_bn"], sd,
                   f"{tname}.downsample.1")


def convert_detr_torch(sd: Dict[str, np.ndarray], prefix: str = "detr.",
                       num_decoder_layers: int = 6,
                       num_encoder_layers: int = 6,
                       layers=(3, 4, 6, 3), dim: int = 256):
    """Reference DETR(+roi head) torch params -> (params, batch_stats) trees
    matching `gpv_tpu.models.detr.DETR`."""
    params: dict = {}
    stats: dict = {}
    bb = f"{prefix}backbone.0.body."
    _set(params, ["backbone", "conv1", "kernel"],
         _conv_kernel(sd[bb + "conv1.weight"]))
    _frozen_bn(params, stats, ["backbone", "bn1"], sd, bb + "bn1")
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            _resnet_bottleneck(params, stats,
                               ["backbone", f"layer{stage + 1}",
                                f"block{b}"],
                               sd, f"{bb}layer{stage + 1}.{b}")

    _set(params, ["input_proj", "kernel"],
         _conv_kernel(sd[f"{prefix}input_proj.weight"]))
    _set(params, ["input_proj", "bias"], sd[f"{prefix}input_proj.bias"])
    _set(params, ["query_embed"], sd[f"{prefix}query_embed.weight"])

    t = f"{prefix}transformer."
    for i in range(num_encoder_layers):
        base = ["transformer", f"encoder_layer{i}"]
        tn = f"{t}encoder.layers.{i}"
        _mha(params, base + ["self_attn"], sd, f"{tn}.self_attn", dim)
        _linear(params, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(params, base + ["linear2"], sd, f"{tn}.linear2")
        _layernorm(params, base + ["norm1"], sd, f"{tn}.norm1")
        _layernorm(params, base + ["norm2"], sd, f"{tn}.norm2")
    for i in range(num_decoder_layers):
        base = ["transformer", f"decoder_layer{i}"]
        tn = f"{t}decoder.layers.{i}"
        _mha(params, base + ["self_attn"], sd, f"{tn}.self_attn", dim)
        _mha(params, base + ["cross_attn"], sd, f"{tn}.multihead_attn", dim)
        _linear(params, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(params, base + ["linear2"], sd, f"{tn}.linear2")
        for j in (1, 2, 3):
            _layernorm(params, base + [f"norm{j}"], sd, f"{tn}.norm{j}")
    _layernorm(params, ["transformer", "decoder_norm"], sd,
               f"{t}decoder.norm")
    if f"{t}encoder.norm.weight" in sd:
        # pre-norm checkpoints carry a final encoder LayerNorm
        # (reference transformer.py:27)
        _layernorm(params, ["transformer", "encoder_norm"], sd,
                   f"{t}encoder.norm")
    if f"{prefix}backbone.1.row_embed.weight" in sd:
        # learned 2-D position embedding (position_encoding.py:51-76);
        # backbone.1 is the Joiner's position-embedding slot
        _set(params, ["position_embedding", "row_embed"],
             sd[f"{prefix}backbone.1.row_embed.weight"])
        _set(params, ["position_embedding", "col_embed"],
             sd[f"{prefix}backbone.1.col_embed.weight"])

    _linear(params, ["class_embed"], sd, f"{prefix}class_embed")
    for i in range(3):
        _linear(params, ["bbox_embed", f"layer{i}"], sd,
                f"{prefix}bbox_embed.layers.{i}")
    return params, stats


def convert_bert_torch(sd: Dict[str, np.ndarray],
                       prefix: str = "bert.model.",
                       num_layers: int = 12, dim: int = 768):
    """HF BertModel torch params -> params tree matching
    `gpv_tpu.nn.bert.BertEncoder`."""
    p: dict = {}
    emb = f"{prefix}embeddings."
    _set(p, ["embeddings", "word_embeddings", "embedding"],
         sd[emb + "word_embeddings.weight"])
    _set(p, ["embeddings", "position_embeddings", "embedding"],
         sd[emb + "position_embeddings.weight"])
    _set(p, ["embeddings", "token_type_embeddings", "embedding"],
         sd[emb + "token_type_embeddings.weight"])
    _layernorm(p, ["embeddings", "LayerNorm"], sd, emb + "LayerNorm")
    for i in range(num_layers):
        tn = f"{prefix}encoder.layer.{i}."
        base = [f"layer{i}"]
        att = base + ["attention"]
        _linear(p, att + ["q_proj"], sd, tn + "attention.self.query")
        _linear(p, att + ["k_proj"], sd, tn + "attention.self.key")
        _linear(p, att + ["v_proj"], sd, tn + "attention.self.value")
        _linear(p, att + ["out_proj"], sd, tn + "attention.output.dense")
        _layernorm(p, base + ["attention_norm"], sd,
                   tn + "attention.output.LayerNorm")
        _linear(p, base + ["intermediate"], sd, tn + "intermediate.dense")
        _linear(p, base + ["output"], sd, tn + "output.dense")
        _layernorm(p, base + ["output_norm"], sd, tn + "output.LayerNorm")
    return p


def convert_gpv_torch(sd: Dict[str, np.ndarray], num_co_att: int = 3,
                      text_dec_layers: int = 3, hidden: int = 768,
                      detr_layers=(3, 4, 6, 3), detr_dim: int = 256,
                      detr_enc: int = 6, detr_dec: int = 6,
                      bert_layers: int = 12):
    """Full reference GPV torch state dict -> {'params':…, 'batch_stats':…}
    matching `gpv_tpu.models.gpv.GPV`."""
    sd = _strip_prefix(sd)
    params, stats = convert_detr_torch(
        sd, num_decoder_layers=detr_dec, num_encoder_layers=detr_enc,
        layers=detr_layers, dim=detr_dim)
    tree = {"detr": params}
    stats_tree = {"detr": stats}

    _linear(tree, ["detr_joiner"], sd, "detr_joiner")
    tree["bert"] = convert_bert_torch(sd, num_layers=bert_layers,
                                      dim=hidden)
    _linear(tree, ["bert_joiner"], sd, "bert_joiner")

    for i in range(num_co_att):
        base = [f"co_att{i}"]
        tn = f"co_att_transformer.{i}."
        bi = base + ["biattention"]
        # reference stream naming: 1 = the module's "vision" weights which GPV
        # feeds with TEXT (input_tensor1=lv), 2 = fed with VISION (vl).
        for proj in ("query", "key", "value"):
            _linear(tree, bi + [f"{proj}1"], sd,
                    tn + f"biattention.{proj}1")
            _linear(tree, bi + [f"{proj}2"], sd,
                    tn + f"biattention.{proj}2")
        _linear(tree, base + ["dense1"], sd, tn + "biOutput.dense1")
        _layernorm(tree, base + ["attn_norm1"], sd, tn + "biOutput.LayerNorm1")
        _linear(tree, base + ["dense2"], sd, tn + "biOutput.dense2")
        _layernorm(tree, base + ["attn_norm2"], sd, tn + "biOutput.LayerNorm2")
        _linear(tree, base + ["ffn_in1"], sd, tn + "v_intermediate.dense")
        _linear(tree, base + ["ffn_out1"], sd, tn + "v_output.dense")
        _layernorm(tree, base + ["ffn_norm1"], sd, tn + "v_output.LayerNorm")
        _linear(tree, base + ["ffn_in2"], sd, tn + "t_intermediate.dense")
        _linear(tree, base + ["ffn_out2"], sd, tn + "t_output.dense")
        _layernorm(tree, base + ["ffn_norm2"], sd, tn + "t_output.LayerNorm")

    _linear(tree, ["relevance_predictor"], sd, "relevance_predictor")

    for i in range(text_dec_layers):
        base = ["text_decoder", f"layer{i}"]
        tn = f"text_decoder.layers.{i}"
        _mha(tree, base + ["self_attn"], sd, f"{tn}.self_attn", hidden)
        _mha(tree, base + ["cross_attn"], sd, f"{tn}.multihead_attn", hidden)
        _linear(tree, base + ["linear1"], sd, f"{tn}.linear1")
        _linear(tree, base + ["linear2"], sd, f"{tn}.linear2")
        for j in (1, 2, 3):
            _layernorm(tree, base + [f"norm{j}"], sd, f"{tn}.norm{j}")

    _set(tree, ["vocab_embed"], sd["answer_head.vocab_embed"])
    if "answer_head.classifier_transform.weight" in sd:
        _linear(tree, ["classifier_transform"], sd,
                "answer_head.classifier_transform")
    elif "answer_head.classifier.weight" in sd:
        _linear(tree, ["classifier"], sd, "answer_head.classifier")
    _linear(tree, ["answer_input_transform"], sd,
            "answer_input_embedings.transform")
    _set(tree, ["vision_token"], sd["vision_token"])
    _set(tree, ["lang_token"], sd["lang_token"])
    _set(tree, ["relevance_tokens"], sd["relevance_tokens"])
    return {"params": tree, "batch_stats": stats_tree}


def _merge_matching(dst: dict, src: dict, matched=None, _path=()):
    """Copy src entries into dst where name AND shape match (the reference's
    shape-checked partial-load semantics, gpv.py:122-135). When `matched`
    is a set, the '/'-joined path of every copied leaf is recorded in it."""
    for k, v in src.items():
        if isinstance(v, dict):
            if k in dst:
                _merge_matching(dst[k], v, matched, _path + (k,))
        elif k in dst and np.shape(dst[k]) == np.shape(v):
            dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
            if matched is not None:
                matched.add("/".join(_path + (k,)))


def load_pretr_detr(variables: dict, torch_path: str | Path):
    """DETR-only init (reference `GPV.load_pretr_detr`, gpv.py:122-135):
    copy matching detr.* entries by name+shape from a DETR torch ckpt.

    Returns (variables, matched): `matched` is the set of '/'-paths under
    params['detr'] that actually loaded — the reference's
    `init_detr_params`, which is exactly the set `training.freeze` freezes
    in phase 1 (train_distr.py:136-140). Params that did NOT load (absent
    key or shape mismatch, e.g. class_embed with a different num_classes)
    keep training upstream and must keep training here.
    """
    sd = load_torch_state_dict(torch_path)
    params, stats = convert_detr_torch(sd, prefix="")
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-ish copy
    matched: set = set()
    _merge_matching(out["params"]["detr"], params, matched)
    _merge_matching(out.get("batch_stats", {}).get("detr", {}), stats)
    return out, matched


def convert_torchvision_resnet50(sd: Dict[str, np.ndarray],
                                 layers=(3, 4, 6, 3)):
    """Raw torchvision `resnet50().state_dict()` -> (params, batch_stats)
    trees for the DETR `backbone` submodule.

    Torchvision naming has NO `backbone.0.body.` prefix (`conv1.weight`,
    `layer1.0.conv1.weight`, `layer1.0.downsample.{0,1}.*`); the `fc.*`
    classifier head is ignored. BN statistics land in batch_stats exactly as
    FrozenBatchNorm expects — the reference initializes its backbone from
    torchvision ImageNet weights when no DETR checkpoint is given
    (`exp/gpv/models/backbone.py:68`, pretrained=is_main_process())."""
    params: dict = {}
    stats: dict = {}
    _set(params, ["conv1", "kernel"], _conv_kernel(sd["conv1.weight"]))
    _frozen_bn(params, stats, ["bn1"], sd, "bn1")
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            _resnet_bottleneck(params, stats,
                               [f"layer{stage + 1}", f"block{b}"],
                               sd, f"layer{stage + 1}.{b}")
    return params, stats


def load_imagenet_backbone(variables: dict, torch_path: str | Path) -> dict:
    """Initialize ONLY the ResNet-50 backbone from a raw torchvision
    ImageNet state dict — the from-scratch training recipe when
    `model.pretr_detr` is absent (reference `backbone.py:68`)."""
    sd = load_torch_state_dict(torch_path)
    params, stats = convert_torchvision_resnet50(sd)
    out = jax.tree_util.tree_map(lambda x: x, variables)
    _merge_matching(out["params"]["detr"]["backbone"], params)
    _merge_matching(
        out.get("batch_stats", {}).get("detr", {}).get("backbone", {}),
        stats)
    return out
