"""Inference stage split on the chip: encode vs decode vs full, across
serving batch sizes. Scalar-checksum outputs force real device sync through
the axon relay (large-output block_until_ready acks early there).

Usage: python scripts/bench_infer_stages.py [batches=20,64] [iters=8]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

VOCAB, MAX_TEXT_LEN, H, W = 10000, 20, 480, 640


def main():
    import jax
    import jax.numpy as jnp

    from gpv_tpu.decode import greedy_decode
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.ops.fold_bn import fold_frozen_bn

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    args = dict(a.split("=", 1) for a in sys.argv[1:])
    batches = [int(x) for x in args.get("batches", "20,64").split(",")]
    iters = int(args.get("iters", 8))

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=VOCAB, max_text_len=MAX_TEXT_LEN,
                detr_cfg=detr_cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, H, W, 3)),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, MAX_TEXT_LEN), jnp.int32),
                           train=False)
    p, s = fold_frozen_bn(variables["params"], variables["batch_stats"])
    variables = {"params": jax.tree.map(jnp.asarray, p),
                 "batch_stats": jax.tree.map(jnp.asarray, s)}
    cls_id = VOCAB - 3

    def checksum(tree):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree.leaves(tree))

    def make_stages(model, tag=""):
        @jax.jit
        def encode_only(variables, images, qids, qvalid):
            memory, mem_valid, outputs = model.apply(
                variables, images, qids, query_valid=qvalid,
                method=GPV.encode)
            return checksum((memory, outputs["pred_boxes"],
                             outputs["pred_relevance_logits"]))

        @jax.jit
        def full(variables, images, qids, qvalid):
            memory, mem_valid, outputs = model.apply(
                variables, images, qids, query_valid=qvalid,
                method=GPV.encode)
            tokens, _ = greedy_decode(model, variables, memory, mem_valid,
                                      cls_id)
            return (checksum((tokens, outputs["pred_boxes"]))
                    + checksum(memory))

        @jax.jit
        def full_beam5(variables, images, qids, qvalid):
            # BASELINE config #4: VQA+Captioning with beam_size=5
            from gpv_tpu.decode import beam_decode
            memory, mem_valid, outputs = model.apply(
                variables, images, qids, query_valid=qvalid,
                method=GPV.encode)
            seqs, logp = beam_decode(model, variables, memory, mem_valid,
                                     cls_id, 5)
            return checksum((seqs, logp, outputs["pred_boxes"]))

        return ((f"encode_only{tag}", encode_only), (f"full{tag}", full),
                (f"full_beam5{tag}", full_beam5))

    variants = [(make_stages(model), variables)]
    if args.get("s2d") == "1":
        # exact space-to-depth stem rewrite (ops/stem_s2d.py): same session
        # A/B against the plain stem
        from gpv_tpu.ops.stem_s2d import apply_stem_s2d
        model_s2d = GPV(vocab_size=VOCAB, max_text_len=MAX_TEXT_LEN,
                        detr_cfg=dict(detr_cfg, stem_s2d=True),
                        dtype=jnp.bfloat16)
        variables_s2d = {
            "params": jax.tree.map(jnp.asarray,
                                   apply_stem_s2d(variables["params"])),
            "batch_stats": variables["batch_stats"]}
        variants.append((make_stages(model_s2d, "_s2d"), variables_s2d))

    for B in batches:
        images = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3),
                                   jnp.float32)
        qids = jax.random.randint(jax.random.PRNGKey(2), (B, 12), 0, 30522)
        qvalid = jnp.ones((B, 12), bool)
        # one distinct device buffer per timed call: the relay serves
        # byte-identical repeat dispatches from a cache, which would fake
        # the per-iteration wall time
        # (i+1): i=0 would be byte-identical to the warmup input and could
        # be served by the relay dedup cache (min-of-N would pick the fake)
        image_rot = [images + jnp.float32(i + 1) * 1e-6
                     for i in range(iters)]
        jax.block_until_ready(image_rot)
        for stages, vv in variants:
            for name, fn in stages:
                out = fn(vv, images, qids, qvalid)
                jax.block_until_ready(out)
                ts = []
                for i in range(iters):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(vv, image_rot[i], qids,
                                             qvalid))
                    ts.append(time.perf_counter() - t0)
                ms = 1000 * min(ts)
                print(json.dumps({"stage": name, "B": B,
                                  "ms": round(ms, 2),
                                  "img_per_sec": round(B / min(ts), 1)}),
                      flush=True)


if __name__ == "__main__":
    main()
