"""MFU attack instrumentation (VERDICT r2 item 3).

Times the train step's submodules separately at full size and reports
XLA's own FLOP counts (compiled.cost_analysis()) next to wall time, so
achieved TF/s per component is measured, not estimated from a constant:

  - ResNet-50 backbone fwd and fwd+bwd (the HBM-bound suspect)
  - BERT query encoder fwd (frozen: forward-only every step)
  - full GPV fwd / fwd+bwd / full step

Every timed fn returns a SCALAR (relay block_until_ready on large outputs
acks early — BASELINE.md); subtract the ~29 ms relay RTT for device time.

Usage: python scripts/bench_mfu_breakdown.py [B=120] [steps=4]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFS = 197.0  # v5e bf16 peak


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.losses import LossConfig
    from gpv_tpu.losses.criterion import gpv_criterion
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.ops.image import normalize_image
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_train_step import make_batch

    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    B = int(args.get("B", 120))
    steps = int(args.get("steps", 4))

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=10000, detr_cfg=detr_cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, 20), jnp.int32), train=False)
    batch = {k: jnp.asarray(v) for k, v in make_batch(B).items()}
    rng = jax.random.PRNGKey(1)
    cfg = LossConfig()

    def report(name, fn, *fargs, flops_note=""):
        jfn = jax.jit(fn)
        lowered = jfn.lower(*fargs)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", float("nan")))
            hbm_bytes = float(ca.get("bytes accessed", float("nan")))
        except Exception:  # relay may not expose cost analysis
            flops, hbm_bytes = float("nan"), float("nan")
        # float() forces a real device->host value fetch: through the relay
        # even scalar block_until_ready can ack early, and identical
        # dispatches can be served from a relay-side cache — every stage fn
        # must consume `rng` so inputs genuinely differ per call
        float(jfn(*fargs[:-1], jax.random.fold_in(fargs[-1], 999)))
        ts = []
        for i in range(steps):
            r = jax.random.fold_in(fargs[-1], i)
            t0 = time.perf_counter()
            float(jfn(*fargs[:-1], r))
            ts.append(time.perf_counter() - t0)
        ms = 1000 * min(ts)
        dev_ms = max(ms - 29.0, 0.1)  # relay RTT floor correction
        tfs = flops / (dev_ms / 1e3) / 1e12 if flops == flops else None
        row = {"stage": name, "B": B, "ms_wall": round(ms, 1),
               "ms_device_est": round(dev_ms, 1),
               "xla_gflops": round(flops / 1e9, 1) if flops == flops else None,
               "xla_hbm_gb": round(hbm_bytes / 1e9, 2)
               if hbm_bytes == hbm_bytes else None,
               "achieved_tfs": round(tfs, 1) if tfs else None,
               "mfu_vs_197tf": round(tfs / PEAK_TFS, 3) if tfs else None,
               "all_ms": [round(1000 * t, 1) for t in ts]}
        if flops_note:
            row["note"] = flops_note
        print(json.dumps(row), flush=True)
        return ms

    # --- ResNet backbone alone (image prep in-graph, like the train step)
    from gpv_tpu.nn.bert import BertEncoder
    from gpv_tpu.nn.resnet import ResNet
    resnet = ResNet(layers=(3, 4, 6, 3), return_layers=("layer4",),
                    dtype=jnp.bfloat16)
    res_vars = {"params": variables["params"]["detr"]["backbone"],
                "batch_stats": variables["batch_stats"]["detr"]["backbone"]}

    def _rng_eps(rng):
        # un-foldable data dependence on rng (see report(): the relay can
        # serve byte-identical dispatches from cache)
        return jnp.sum(rng).astype(jnp.float32) * 1e-20

    def resnet_fwd(res_vars, batch, rng):
        img = normalize_image(batch["image"].astype(jnp.float32) / 255.0
                              + _rng_eps(rng))
        feats = resnet.apply(res_vars, img.astype(jnp.bfloat16))["layer4"]
        return jnp.sum(feats.astype(jnp.float32))

    def resnet_fwd_bwd(res_vars, batch, rng):
        def loss(params):
            v = {"params": params, "batch_stats": res_vars["batch_stats"]}
            img = normalize_image(batch["image"].astype(jnp.float32) / 255.0
                                  + _rng_eps(rng))
            feats = resnet.apply(v, img.astype(jnp.bfloat16))["layer4"]
            return jnp.sum(feats.astype(jnp.float32) ** 2)
        val, grads = jax.value_and_grad(loss)(res_vars["params"])
        return val + sum(jnp.sum(g.astype(jnp.float32))
                         for g in jax.tree.leaves(grads))

    # --- BERT query encoder alone (frozen -> forward-only each step)
    bert = BertEncoder(dtype=jnp.bfloat16)
    bert_vars = {"params": variables["params"]["bert"]}

    def bert_fwd(bert_vars, batch, rng):
        out = bert.apply(bert_vars, batch["query_ids"])
        # rng dependence on the OUTPUT: the relay caches whole dispatches
        # by (executable, inputs), so a differing input defeats the cache
        return jnp.sum(out.astype(jnp.float32)) + _rng_eps(rng)

    # --- full model fwd / fwd+bwd
    def _fwd_out(variables, batch, rng):
        img = normalize_image(batch["image"].astype(jnp.float32) / 255.0)
        return model.apply(variables, img, batch["query_ids"],
                           batch["answer_ids"],
                           query_valid=batch["query_valid"],
                           train=True, rngs={"dropout": rng})

    def fwd(variables, batch, rng):
        out = _fwd_out(variables, batch, rng)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                   if hasattr(v, "dtype"))

    def fwd_bwd(variables, batch, rng):
        def loss_fn(params):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            out = _fwd_out(v, batch, rng)
            total, losses = gpv_criterion(out, batch, cfg)
            return total
        total, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return total + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree.leaves(grads))

    # --- r4 additions: isolate the criterion (matcher + all 6 loss terms,
    # model outputs traced as INPUTS) and the model-only fwd+bwd (surrogate
    # sum loss), so criterion cost = full - surrogate cross-checks against
    # the direct measurement; plus the dedup'd BERT (training.query_dedup)
    def criterion_only(outputs, batch, rng):
        total, _ = gpv_criterion(outputs, batch, cfg)
        return total + _rng_eps(rng)

    def fwd_bwd_surrogate(variables, batch, rng):
        def loss_fn(params):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            out = _fwd_out(v, batch, rng)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(out))
        total, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return total + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree.leaves(grads))

    U = 64  # measured unique-query bucket at B=120 (bench_train_step)

    def bert_fwd_dedup(bert_vars, batch, rng):
        out = bert.apply(bert_vars, batch["query_ids"][:U])
        gathered = jnp.take(out, jnp.arange(batch["query_ids"].shape[0]) % U,
                            axis=0)
        return jnp.sum(gathered.astype(jnp.float32)) + _rng_eps(rng)

    report("bert_fwd", bert_fwd, bert_vars, batch, rng)
    if B > U:
        report(f"bert_fwd_dedup_u{U}", bert_fwd_dedup, bert_vars, batch, rng)
    report("resnet_fwd", resnet_fwd, res_vars, batch, rng)
    report("resnet_fwd_bwd", resnet_fwd_bwd, res_vars, batch, rng)
    report("full_fwd", fwd, variables, batch, rng)
    outputs = jax.jit(_fwd_out)(variables, batch, rng)
    report("criterion_only", criterion_only, outputs, batch, rng)
    report("full_fwd_bwd_surrogate", fwd_bwd_surrogate, variables, batch,
           rng)
    report("full_fwd_bwd_loss", fwd_bwd, variables, batch, rng)


if __name__ == "__main__":
    main()
