"""Decompose the full train step's time: fwd / fwd+loss / +bwd / +optimizer,
plus the on-device Hungarian matcher alone (20 scanned iterations to
amortize the relay's ~29 ms synchronous RTT floor — see BASELINE.md).
Prints one JSON row per stage; subtract the RTT floor from the synchronous
stage numbers for device time."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np



def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.losses import LossConfig
    from gpv_tpu.losses.criterion import gpv_criterion
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.parallel import create_train_state, make_train_step
    from gpv_tpu.train import build_optimizer
    from gpv_tpu.utils.config import ConfigNode
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_train_step import make_batch

    B = int(dict(a.split("=", 1) for a in sys.argv[1:]).get("B", 32))
    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=10000, detr_cfg=detr_cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, 20), jnp.int32), train=False)
    cfg = LossConfig()
    batch = {k: jnp.asarray(v) for k, v in make_batch(B).items()}
    rng = jax.random.PRNGKey(1)

    from gpv_tpu.ops.image import normalize_image

    def prep(b):
        b = dict(b)
        b["image"] = normalize_image(b["image"].astype(jnp.float32) / 255.0)
        return b

    def _fwd_out(variables, batch, rng):
        b = prep(batch)
        return model.apply(variables, b["image"], b["query_ids"],
                           b["answer_ids"], query_valid=b["query_valid"],
                           train=True, rngs={"dropout": rng})

    # every timed fn returns a SCALAR checksum: through the axon relay,
    # block_until_ready on large outputs acks before compute finishes;
    # scalar results are inlined in the ack and therefore truly awaited
    def fwd(variables, batch, rng):
        out = _fwd_out(variables, batch, rng)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values()
                   if hasattr(v, "dtype"))

    def fwd_loss(variables, batch, rng):
        out = _fwd_out(variables, batch, rng)
        total, losses = gpv_criterion(out, batch, cfg)
        return total

    def grad_fn(variables, batch, rng):
        def loss_fn(params):
            v = {"params": params, "batch_stats": variables["batch_stats"]}
            out = _fwd_out(v, batch, rng)
            total, losses = gpv_criterion(out, batch, cfg)
            return total, losses
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return total + sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree.leaves(grads))

    def timeit(name, fn, *args):
        # vary the rng every call: repeated IDENTICAL dispatches can be
        # served from a relay-side cache and time at ~1 ms
        out = fn(*args[:-1], jax.random.fold_in(args[-1], 999))
        jax.block_until_ready(out)
        ts = []
        for i in range(4):
            r = jax.random.fold_in(args[-1], i)
            t0 = time.perf_counter()
            out = fn(*args[:-1], r)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"stage": name, "B": B,
                          "ms": round(1000 * min(ts), 1),
                          "all_ms": [round(1000 * t, 1) for t in ts]}),
              flush=True)
        return min(ts)

    timeit("forward_only", jax.jit(fwd), variables, batch, rng)
    timeit("forward_plus_loss_and_matcher", jax.jit(fwd_loss), variables,
           batch, rng)
    timeit("forward_backward", jax.jit(grad_fn), variables, batch, rng)

    training_cfg = ConfigNode({
        "num_epochs": 40, "lr": 1e-4, "lr_backbone": 1e-5,
        "weight_decay": 1e-4, "lr_milestones": [10], "lr_drop": 0.5,
        "lr_warmup": True, "lr_linear_decay": True,
        "lr_warmup_fraction": 0.1, "freeze": False})
    optimizer = build_optimizer(training_cfg, 1000, variables["params"])
    state = create_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, cfg, 0.1, mesh=None,
                           donate=False)

    def full(state, batch, rng):
        st, losses = step(state, batch, rng)
        return losses["total_loss"]

    timeit("full_step", full, state, batch, rng)

    # matcher alone, 20 scanned iterations (amortizes the relay RTT floor)
    from gpv_tpu.ops.matcher import hungarian_match

    @jax.jit
    def matcher20(logits, boxes, tl, tb, valid):
        def body(c, i):
            q4t = hungarian_match(logits + i * 1e-6, boxes, tl, tb, valid)
            return c + jnp.sum(q4t), None
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(20))
        return c

    rngm = np.random.RandomState(0)
    Q, M = 100, 8
    margs = (jnp.asarray(rngm.randn(B, Q, 2).astype(np.float32)),
             jnp.asarray((0.3 + 0.4 * rngm.rand(B, Q, 4)).astype(np.float32)),
             jnp.zeros((B, M), jnp.int32),
             jnp.asarray((0.3 + 0.4 * rngm.rand(B, M, 4)).astype(np.float32)),
             jnp.asarray(np.tile([True] * 5 + [False] * 3, (B, 1))))
    int(matcher20(*margs))
    t0 = time.perf_counter()
    int(matcher20(*margs))
    per = (time.perf_counter() - t0) / 20
    print(json.dumps({"stage": "matcher_amortized", "B": B,
                      "ms": round(1000 * per, 2)}), flush=True)


if __name__ == "__main__":
    main()
