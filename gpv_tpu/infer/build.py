"""Engine construction from a composed config (`build_engine`).

Shared by every inference-side CLI (root `inference.py` /
`inference_beam_search.py`, `gpv_tpu.cli.{compute_predictions,
compute_test_predictions, predict_folder, serve_http, export_serving}`).
Lives inside the package so installed deployments don't depend on the
repo-root `inference.py` script (which re-exports this for the reference
CLI surface). The config-group yamls under `configs/` are still repo
data — config-driven CLIs run from a checkout, exactly like the
reference's hydra entry points; AOT-bundle serving needs neither.
"""
from __future__ import annotations

import numpy as np


def build_engine(cfg):
    """Composed `exp/gpv[_inference]` config -> ready `GPVEngine`.

    Honors `ckpt` (orbax dir, reference torch .pth, or null for random
    init — missing paths fail loudly), `tpu.dtype`,
    `tpu.infer_data_parallel` (shard inference batches over N local
    devices; -1 = all), and `tpu.compile_cache_dir`.
    """
    import jax
    import jax.numpy as jnp

    from ..engine import GPVEngine

    cache_dir = (cfg.get("tpu") or {}).get("compile_cache_dir")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from ..text.vocab import AnswerVocab
    from ..text.wordpiece import WordPieceTokenizer

    vocab = (AnswerVocab.load(cfg.model.vocab) if cfg.model.vocab
             else AnswerVocab.debug())
    bert_vocab = cfg.model.get("bert_vocab")
    tokenizer = (WordPieceTokenizer.load(bert_vocab) if bert_vocab
                 else WordPieceTokenizer.debug())

    # tpu.infer_data_parallel: shard inference batches over N local devices
    # (-1 = all). The reference evaluates on one GPU; this runs the same
    # graph SPMD across a slice (see GPVEngine mesh docs).
    mesh = None
    n_dp = int((cfg.get("tpu") or {}).get("infer_data_parallel", 1) or 1)
    if n_dp != 1:
        devs = jax.local_devices()
        n_dp = len(devs) if n_dp < 0 else n_dp
        if n_dp > len(devs):
            raise ValueError(
                f"tpu.infer_data_parallel={n_dp} but only {len(devs)} "
                "local devices are visible")
        if n_dp > 1:
            mesh = jax.sharding.Mesh(np.asarray(devs[:n_dp]), ("dp",))
    # tpu.dtype governs the compute dtype here exactly as in the trainer
    # (bfloat16 default; float32 for maximum-parity eval)
    dtype = (jnp.bfloat16
             if str((cfg.get("tpu") or {}).get("dtype", "bfloat16"))
             == "bfloat16" else jnp.float32)
    engine = GPVEngine.from_config(cfg.model, vocab, tokenizer,
                                   dtype=dtype, mesh=mesh)

    ckpt = cfg.get("ckpt")
    if ckpt:
        from pathlib import Path
        if not Path(str(ckpt)).exists():
            raise FileNotFoundError(
                f"checkpoint not found: {ckpt} (pass ckpt=<path to an orbax "
                "dir or reference model.pth>, or ckpt=null for random init)")
        if str(ckpt).endswith(".pth"):
            from ..train.checkpoint import (convert_gpv_torch,
                                            load_torch_state_dict)
            variables = convert_gpv_torch(load_torch_state_dict(ckpt))
        else:
            from ..train.checkpoint import restore_checkpoint
            variables, _ = restore_checkpoint(Path(ckpt).parent,
                                              name=Path(ckpt).name)
            variables = {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})}
        engine.variables = jax.tree.map(np.asarray, variables)
    return engine
