"""Full-size train-step benchmark on the real chip (VERDICT r1 item 3).

Measures ms/step for the full GPV train step (fwd + losses + on-device
matching + bwd + AdamW) at full model size (768-d, ResNet-50, 6+6 DETR,
12-layer BERT) across batch/remat/grad-accum configs; prints one JSON row
per config. Used to root-cause the r1 remat/large-batch cliff and to
establish the batch-120-equivalent throughput claim in BASELINE.md.

Usage:
  python scripts/bench_train_step.py 'B=16' 'B=32' 'B=32,accum=2' \
      'B=120,accum=8' 'B=16,remat=1' [steps=5] [profile_dir=/tmp/trace]
Each positional arg is one config: B=<batch>[,accum=<k>][,remat=0|1].
"""
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# XLA cost_analysis of the compiled B=120 fwd+bwd+loss HLO counts 215.6
# GF/img (FMA=2 convention; scripts/bench_mfu_breakdown.py, BASELINE.md "r3
# roofline"). The r2 hand estimate (165e9) undercounted conv FLOPs.
TRAIN_FLOPS_PER_IMG = 215.6e9


def make_batch(B, H=480, W=640, S=20, M=8, Tq=12, vocab=10000,
               bert_vocab=30522, dedup=False):
    rng = np.random.RandomState(0)
    tasks = np.arange(B) % 4  # cap, vqa, cls, det ids 0..3
    # realistic query composition: det/cls/cap rows draw from the
    # reference's fixed template pools (18/14/4 templates,
    # data/preprocess.py), VQA rows are free-form (unique per row)
    pool = {0: rng.randint(0, bert_vocab, (4, Tq)),
            2: rng.randint(0, bert_vocab, (14, Tq)),
            3: rng.randint(0, bert_vocab, (18, Tq))}
    query_ids = np.empty((B, Tq), np.int64)
    for i in range(B):
        t = tasks[i]
        if t == 1:
            query_ids[i] = rng.randint(0, bert_vocab, Tq)
        else:
            query_ids[i] = pool[t][rng.randint(len(pool[t]))]
    batch_extra = {}
    if dedup:
        uniq, first, inverse = np.unique(query_ids, axis=0,
                                         return_index=True,
                                         return_inverse=True)
        U = max(16, ((len(uniq) + 15) // 16) * 16)
        pad = U - len(uniq)
        batch_extra = {
            "query_uniq_ids": np.concatenate(
                [uniq, np.broadcast_to(uniq[:1], (pad, Tq))]).astype(
                np.int32),
            "query_uniq_valid": np.ones((U, Tq), bool),
            "query_gather": inverse.astype(np.int32).reshape(B),
        }
        print(f"dedup: B={B} unique={len(uniq)} bucket={U}",
              file=sys.stderr)
    return {
        "image": rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8),
        "query_ids": query_ids.astype(np.int32),
        "query_valid": np.ones((B, Tq), bool),
        **batch_extra,
        "answer_ids": rng.randint(0, vocab, (B, S)).astype(np.int32),
        "answer_lens": np.full((B,), 12, np.int32),
        "task_id": tasks.astype(np.int32),
        "has_answer": tasks != 3,
        "boxes": rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32),
        "box_labels": np.zeros((B, M), np.int32),
        "box_valid": np.tile([True] * 3 + [False] * (M - 3), (B, 1)),
        "has_boxes": tasks == 3,
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.losses import LossConfig
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.parallel import create_train_state, make_train_step
    from gpv_tpu.train import build_optimizer
    from gpv_tpu.utils.config import ConfigNode

    kv = [a for a in sys.argv[1:]
          if a.startswith(("steps=", "profile_dir=", "platform="))]
    opts = dict(a.split("=", 1) for a in kv)
    steps = int(opts.get("steps", 5))
    profile_dir = opts.get("profile_dir")
    if opts.get("platform"):
        # smoke-testing the harness off-TPU (the sitecustomize axon
        # registration wins over the env var, so pin via config)
        jax.config.update("jax_platforms", opts["platform"])
    configs = []
    for a in sys.argv[1:]:
        if a in kv:
            continue
        d = dict(x.split("=", 1) for x in a.split(","))
        configs.append((int(d["B"]), int(d.get("accum", 1)),
                        bool(int(d.get("remat", 0))),
                        bool(int(d.get("freeze", 0))),
                        bool(int(d.get("tiny", 0))),
                        bool(int(d.get("dedup", 0)))))
    if not configs:
        configs = [(16, 1, False, False, False, False)]

    print(f"devices: {jax.devices()}", file=sys.stderr)

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    training_cfg = ConfigNode({
        "num_epochs": 40, "lr": 1e-4, "lr_backbone": 1e-5,
        "weight_decay": 1e-4, "lr_milestones": [10], "lr_drop": 0.5,
        "lr_warmup": True, "lr_linear_decay": True,
        "lr_warmup_fraction": 0.1, "freeze": False,
    })

    prev_key = None
    model = state = None
    for B, accum, remat, freeze, tiny, dedup in configs:
        # tiny=1: toy dims for smoke-testing the harness (e.g. the XLA-flag
        # sweep's subprocess plumbing on CPU) — NOT a performance config
        if tiny:
            bdims = dict(H=48, W=64, S=8, M=4, Tq=5, vocab=64,
                         bert_vocab=100)
            mkw = dict(vocab_size=64, hidden_dim=32, max_text_len=8,
                       co_att_num_layers=1, co_att_heads=4,
                       co_att_intermediate=64, dropout=0.0,
                       text_decoder_layers=1, text_decoder_heads=4,
                       detr_cfg=dict(num_queries=10, num_classes=1,
                                     hidden_dim=32, nheads=4,
                                     num_encoder_layers=1,
                                     num_decoder_layers=1,
                                     dim_feedforward=64, dropout=0.0,
                                     backbone_layers=[1, 1, 1, 1]),
                       bert_layers=1, bert_hidden=32, bert_heads=4,
                       bert_vocab_size=100)
        else:
            bdims = {}
            mkw = dict(vocab_size=10000, detr_cfg=detr_cfg)
        if (remat, tiny) != prev_key:
            model = GPV(remat=remat, dtype=jnp.bfloat16, **mkw)
            batch1 = make_batch(1, **bdims)
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1,) + batch1["image"].shape[1:3] + (3,),
                          jnp.float32),
                jnp.asarray(batch1["query_ids"][:1]),
                jnp.asarray(batch1["answer_ids"][:1]), train=False)
            optimizer = build_optimizer(training_cfg, steps_per_epoch=1000,
                                        params=variables["params"])
            state = create_train_state(variables, optimizer)
            prev_key = (remat, tiny)
        step = make_train_step(model, optimizer, LossConfig(), 0.1,
                               mesh=None, donate=False, grad_accum=accum,
                               freeze_detr=freeze)
        batch = {k: jnp.asarray(v)
                 for k, v in make_batch(B, dedup=dedup, **bdims).items()}
        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        st, losses = step(state, batch, rng)
        jax.block_until_ready(losses)
        compile_s = time.perf_counter() - t0
        del st

        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        times = []
        for i in range(steps):
            # vary rng per call AND fetch a concrete host float: the relay
            # can serve an identical repeated dispatch from a cache (fake
            # ~40 ms "steps"), and block_until_ready on big outputs acks
            # early (BASELINE.md relay notes)
            rng_i = jax.random.fold_in(rng, i)
            t0 = time.perf_counter()
            st, losses = step(state, batch, rng_i)
            float(losses["total_loss"])
            times.append(time.perf_counter() - t0)
            del st
        if profile_dir:
            jax.profiler.stop_trace()

        ms = 1000 * min(times)
        rate = B / min(times)
        # NOTE: the FLOPs/img constant assumes a FULL backward at full
        # size; frozen-phase rows skip the DETR backward and tiny rows are
        # toy dims, so mfu is not meaningful there
        mfu = None if (freeze or tiny) \
            else TRAIN_FLOPS_PER_IMG * rate / 197e12
        print(json.dumps({
            "B": B, "grad_accum": accum, "remat": remat,
            "freeze": freeze, "tiny": tiny, "dedup": dedup,
            "ms_per_step": round(ms, 1), "img_per_sec": round(rate, 1),
            "compile_s": round(compile_s, 1),
            "est_train_mfu": None if mfu is None else round(mfu, 3),
            "total_loss": round(float(losses["total_loss"]), 3),
            "all_ms": [round(1000 * t, 1) for t in times],
        }), flush=True)


if __name__ == "__main__":
    main()
