"""Single-image greedy inference CLI (public API surface #1).

Behavior spec: reference `inference.py` — load checkpoint (torch .pth with
DDP prefix strip, or native orbax), preprocess at NATIVE resolution (no
resize, :69), greedy-decode the answer, print it plus the top
`num_output_boxes` relevance-sorted normalized cxcywh boxes.

Usage:
  python inference.py ckpt=<path> image_path=<img> query="what is this?" \
      [num_output_boxes=5] [model.vocab=<vocab.json>]
"""
import sys

import numpy as np


def build_engine(cfg):
    import jax
    import jax.numpy as jnp

    from gpv_tpu.engine import GPVEngine

    cache_dir = (cfg.get("tpu") or {}).get("compile_cache_dir")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from gpv_tpu.text.vocab import AnswerVocab
    from gpv_tpu.text.wordpiece import WordPieceTokenizer

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
        import jax
        from pathlib import Path
        if not Path(str(ckpt)).exists():
            raise FileNotFoundError(
                f"checkpoint not found: {ckpt} (pass ckpt=<path to an orbax "
                "dir or reference model.pth>, or ckpt=null for random init)")
        if str(ckpt).endswith(".pth"):
            from gpv_tpu.train.checkpoint import (convert_gpv_torch,
                                                  load_torch_state_dict)
            variables = convert_gpv_torch(load_torch_state_dict(ckpt))
        else:
            from gpv_tpu.train.checkpoint import restore_checkpoint
            variables, _ = restore_checkpoint(Path(ckpt).parent,
                                              name=Path(ckpt).name)
            variables = {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})}
        engine.variables = jax.tree.map(np.asarray, variables)
    return engine


def main(argv=None):
    from gpv_tpu.datasets.coco import load_image
    from gpv_tpu.utils.config import load_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv_inference", overrides)
    engine = build_engine(cfg)

    img = load_image(cfg.image_path)  # native H x W (no resize)
    out = engine.predict(img[None], [cfg.query])[0]

    num_boxes = int(cfg.get("num_output_boxes", 5))
    print("answer:", out["answer"])
    print("relevant boxes (cx, cy, w, h):")
    for i in range(min(num_boxes, len(out["boxes"]))):
        b = out["boxes"][i]
        print(f"  {b[0]:.4f} {b[1]:.4f} {b[2]:.4f} {b[3]:.4f} "
              f"(relevance {out['relevance'][i]:.4f})")
    return out


if __name__ == "__main__":
    main()
