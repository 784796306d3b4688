"""Pallas co-attention at TRAIN shapes: attempt-or-decline experiment.

VERDICT r4 weak #5 / next #8: the fusion tail runs ~1.48x above its own
HBM floor and the one untried lever CLASS is a hand-fused Pallas block at
train shapes (the r1 fused attention was rejected at SERVING shapes,
where 160 tiny launches dominate; B=120 training microbatches are a
different regime). This measures the 3-layer co-attention stack — the
fusion tail's transformer core — at GPV train dims (stream1 = text
(B,20,768), stream2 = vision queries (B,100,768), 16 heads, 3072 FFN,
bf16) with:

  - xla:     the default einsum path (the production train step)
  - pallas:  `fused_biattention` (both directions one kernel per
             (batch,head) cell, scores never touch HBM)

Forward pass only: `pallas_call` has no registered VJP here, so a train
adoption would additionally need a custom backward — the forward delta
bounds the best case. Scalar-checksum outputs force real device sync;
inputs rotate per iteration to defeat the relay dispatch cache.

Usage: python scripts/bench_coatt_pallas.py [B=120,20] [iters=6]
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.nn.coattention import CoAttentionLayer

    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    batches = [int(x) for x in args.get("B", "120,20").split(",")]
    iters = int(args.get("iters", 6))
    T1, T2, D = 20, 100, 768

    layers = [CoAttentionLayer(dim=D, num_heads=16, intermediate=3072,
                               dropout=0.0, dtype=jnp.bfloat16)
              for _ in range(3)]

    def stack(variables, x1, x2, seed):
        # data-dependence on seed: the relay caches whole dispatches
        x1 = x1 + (jnp.sum(seed).astype(jnp.bfloat16) * 1e-8)
        for i, lyr in enumerate(layers):
            x1, x2 = lyr.apply(variables[i], x1, x2,
                               deterministic=True)
        return (jnp.sum(x1.astype(jnp.float32)) +
                jnp.sum(x2.astype(jnp.float32)))

    rng = np.random.RandomState(0)
    for B in batches:
        x1 = jnp.asarray(rng.randn(B, T1, D), jnp.bfloat16)
        x2 = jnp.asarray(rng.randn(B, T2, D), jnp.bfloat16)
        variables = [lyr.init(jax.random.PRNGKey(i), x1, x2)
                     for i, lyr in enumerate(layers)]
        for mode in ("xla", "pallas"):
            os.environ["GPV_TPU_PALLAS"] = "1" if mode == "pallas" else "0"
            jfn = jax.jit(stack)
            try:
                compiled = jfn.lower(variables, x1, x2,
                                     jax.random.PRNGKey(0)).compile()
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                gf = round(float(ca.get("flops", float("nan"))) / 1e9, 1)
                gb = round(float(ca.get("bytes accessed",
                                        float("nan"))) / 1e9, 2)
            except Exception:
                gf = gb = None
            float(jfn(variables, x1, x2, jax.random.PRNGKey(99)))  # warmup
            ts = []
            for i in range(iters):
                s = jax.random.PRNGKey(1000 + i)
                t0 = time.perf_counter()
                float(jfn(variables, x1, x2, s))
                ts.append(time.perf_counter() - t0)
            ms = 1000 * min(ts)
            print(json.dumps({
                "stage": f"coatt3_fwd_{mode}", "B": B,
                "ms_wall": round(ms, 1),
                "ms_device_est": round(max(ms - 29.0, 0.1), 1),
                "xla_gflops": gf, "xla_hbm_gb": gb,
                "all_ms": [round(1000 * t, 1) for t in ts]}), flush=True)
            # a retrace with the flag flipped must not reuse the cache
            jfn.clear_cache()


if __name__ == "__main__":
    main()
