"""Probe: does int8 beat bf16 for the ResNet hot convs on this chip?

The inference tower is the encode-path majority (BASELINE.md roofline);
the v5e MXU runs int8 at 2x bf16 peak (394 vs 197 TOPS) and int8
activations halve HBM traffic. Before building any quantized serving
mode, measure whether XLA actually lowers int8 convs to that fast path
here. Shapes are same-C_in/C_out convs from the tower's hot classes so
each iteration can feed the NEXT conv's input (a full-output data
dependence — XLA provably cannot elide or hoist iterations; a weaker
scalar/zero-mult dependence measured 2x ABOVE chip peak on this relay,
i.e. iterations were silently removed).

Each timed row is one dispatch running `scan_iters` chained convs
(RTT-amortized); inputs vary per dispatch past the relay dedup cache.

Usage: python scripts/bench_int8_conv.py [B=20] [iters=6] [scan_iters=20]
"""
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

    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("B", "20"))
    iters = int(args.get("iters", 6))
    scan_iters = int(args.get("scan_iters", 20))

    rng = np.random.RandomState(0)

    # (name, (H, W, C), (kh, kw)) — same-C convs from the tower's hot
    # shape classes (layer1 3x3@64, layer2 3x3@128, layer1-expand-ish
    # 1x1@256, layer3 3x3@256)
    cases = [
        ("3x3_120x160_c64", (120, 160, 64), (3, 3)),
        ("3x3_60x80_c128", (60, 80, 128), (3, 3)),
        ("1x1_120x160_c256", (120, 160, 256), (1, 1)),
        ("3x3_30x40_c256", (30, 40, 256), (3, 3)),
    ]

    def run_case(name, in_hw_c, k_hw, dtype, acc_dtype):
        H, W, C = in_hw_c
        kh, kw = k_hw
        if dtype == jnp.int8:
            x0 = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
            k = jnp.asarray(
                rng.randint(-4, 5, (kh, kw, C, C)), jnp.int8)
        else:
            x0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32),
                             dtype)
            k = jnp.asarray(
                (rng.randn(kh, kw, C, C) * 0.05).astype(np.float32), dtype)

        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]

        def convfn(x):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype)

        @jax.jit
        def fn(x):
            def body(carry, _):
                y = convfn(carry)
                # next input = requantized/renormalized FULL output:
                # airtight serial dependence, and it mirrors what a real
                # quantized tower does between convs
                if dtype == jnp.int8:
                    nxt = (y & jnp.int32(127)).astype(jnp.int8)
                else:
                    nxt = (y * acc_dtype(0.05)).astype(dtype)
                return nxt, y[0, 0, 0, 0].astype(jnp.float32)
            _, ss = jax.lax.scan(body, x, None, length=scan_iters)
            return jnp.sum(ss)

        xs = []
        for i in range(iters):
            if dtype == jnp.int8:
                xs.append(x0 ^ jnp.int8(i + 1))
            else:
                # (i+1): i=0 would be byte-identical to the warmup input
                xs.append(x0 + dtype(i + 1) * dtype(1e-3))
        jax.block_until_ready(xs)
        jax.block_until_ready(fn(x0))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xs[i]))
            ts.append(time.perf_counter() - t0)
        per = 1000 * min(ts) / scan_iters
        macs = B * H * W * C * kh * kw * C
        print(json.dumps({
            "case": name,
            "dtype": "int8" if dtype == jnp.int8 else "bfloat16",
            "ms": round(per, 3),
            "tops": round(2 * macs / per / 1e9, 1)}), flush=True)

    for name, in_shape, k_hw in cases:
        run_case(name, in_shape, k_hw, jnp.bfloat16, jnp.float32)
        run_case(name, in_shape, k_hw, jnp.int8, jnp.int32)


if __name__ == "__main__":
    main()
