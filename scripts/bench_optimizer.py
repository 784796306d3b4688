"""Optimizer-cost microbenchmark (follow-up to the r3 MFU breakdown).

The full-step minus fwd+bwd+loss difference attributed ~40 ms at B=120 to
clip+AdamW, vs a ~7 ms HBM floor for one fused pass over ~250M fp32
params+moments. This isolates the update: times `clip + 4-group AdamW +
apply_updates` on flagship-sized parameters alone, with XLA's own
byte/FLOP counts, and compares candidate variants:

  - production: clip_detr_grads + build_optimizer (multi_transform groups)
  - plain:      one optax.adamw chain, no clip (structural lower bound)
  - bf16_mu:    optax.adamw(mu_dtype=bfloat16) (halves first-moment traffic)

Timing rules (BASELINE.md): every timed call consumes a fresh rng so the
relay cannot serve a cached dispatch, and returns a host float.

Usage: python scripts/bench_optimizer.py [steps=6]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.train.optimizer import build_optimizer, clip_detr_grads
    from gpv_tpu.utils.config import ConfigNode

    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    steps = int(args.get("steps", 6))

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=10000, detr_cfg=detr_cfg, dtype=jnp.bfloat16)
    # params only — shapes from eval_shape, filled on device (no init graph)
    spec = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, 20), jnp.int32), train=False))

    @jax.jit
    def make(seed):
        leaves, treedef = jax.tree_util.tree_flatten(spec["params"])
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        vals = [jax.random.normal(k, s.shape, jnp.float32) * 0.02
                for k, s in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, vals)

    params = jax.block_until_ready(make(0))
    grads = jax.block_until_ready(make(1))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(spec["params"]))
    print(json.dumps({"n_params_m": round(n_params / 1e6, 1),
                      "n_leaves": len(jax.tree.leaves(spec["params"]))}),
          flush=True)

    training_cfg = ConfigNode({
        "num_epochs": 40, "lr": 1e-4, "lr_backbone": 1e-5,
        "weight_decay": 1e-4, "lr_milestones": [24], "lr_drop": 0.5,
        "lr_warmup": True, "lr_linear_decay": True,
        "lr_warmup_fraction": 0.02, "freeze": False,
    })

    def report(name, tx, clip):
        # fresh donated buffers per variant (donation invalidates them)
        params0 = jax.block_until_ready(jax.tree.map(jnp.copy, params))
        opt_state = jax.block_until_ready(tx.init(params0))

        def update(params, opt_state, grads, rng):
            # un-foldable rng dependence on ONE small leaf (defeats the
            # relay dispatch cache without an extra full-tree HBM pass)
            eps = jnp.sum(rng).astype(jnp.float32) * 1e-20
            grads = dict(grads)
            grads["detr_joiner"] = jax.tree.map(lambda g: g + eps,
                                                grads["detr_joiner"])
            if clip:
                grads = clip_detr_grads(grads, 0.1)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.sum(
                params["detr_joiner"]["kernel"].astype(jnp.float32))

        jfn = jax.jit(update, donate_argnums=(0, 1))
        lowered = jfn.lower(params0, opt_state, grads,
                            jax.random.PRNGKey(0))
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", float("nan")))
            hbm = float(ca.get("bytes accessed", float("nan")))
        except Exception:
            flops, hbm = float("nan"), float("nan")
        p, s = params0, opt_state
        rng = jax.random.PRNGKey(7)
        p, s, val = jfn(p, s, grads, rng)  # warm
        float(val)
        ts = []
        for i in range(steps):
            r = jax.random.fold_in(rng, i)
            t0 = time.perf_counter()
            p, s, val = jfn(p, s, grads, r)
            float(val)
            ts.append(time.perf_counter() - t0)
        ms = 1000 * min(ts)
        dev_ms = max(ms - 29.0, 0.1)
        floor_ms = hbm / 819e9 * 1e3 if hbm == hbm else None
        print(json.dumps({
            "variant": name, "ms_wall": round(ms, 1),
            "ms_device_est": round(dev_ms, 1),
            "xla_hbm_gb": round(hbm / 1e9, 2) if hbm == hbm else None,
            "xla_gflops": round(flops / 1e9, 2) if flops == flops else None,
            "hbm_floor_ms_819gbs": round(floor_ms, 1) if floor_ms else None,
            "x_over_floor": round(dev_ms / floor_ms, 2) if floor_ms else None,
            "all_ms": [round(1000 * t, 1) for t in ts]}), flush=True)
        del p, s

    report("production_clip_4group",
           build_optimizer(training_cfg, 1000, params), clip=True)
    report("plain_adamw",
           optax.adamw(1e-4, weight_decay=1e-4), clip=False)
    report("adamw_bf16_mu",
           optax.adamw(1e-4, weight_decay=1e-4, mu_dtype=jnp.bfloat16),
           clip=False)


if __name__ == "__main__":
    main()
