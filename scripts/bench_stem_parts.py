"""Decompose the stem cost: conv vs pool vs blocked conv (s2d transpose
priced as s2d_then_conv4_relu minus conv4_relu_preblocked).

Companion to bench_stem.py — identifies WHICH part of the stem the 3.9 ms
(B=20) goes to, and whether the blocked 4x4 conv beats the 7x7 when the
space-to-depth layout is produced upstream (where the prep pass already
rewrites the image) instead of in-graph right before the conv.

Usage: python scripts/bench_stem_parts.py [B=20] [iters=6] [scan_iters=20]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

H, W = 480, 640


def main():
    import jax
    import jax.numpy as jnp

    from gpv_tpu.ops.stem_s2d import s2d_stem_kernel, space_to_depth

    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("B", "20"))
    iters = int(args.get("iters", 6))
    scan_iters = int(args.get("scan_iters", 20))

    rng = np.random.RandomState(0)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32), jnp.bfloat16)
    k4 = jnp.asarray(s2d_stem_kernel(np.asarray(k7, np.float32)),
                     jnp.bfloat16)
    shift = jnp.asarray(rng.randn(64).astype(np.float32), jnp.bfloat16)

    def conv(x, k, strides, padding):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def pool_sep(y):
        # max is separable: rows then cols (exact same result)
        r = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
            [(0, 0), (1, 1), (0, 0), (0, 0)])
        return jax.lax.reduce_window(
            r, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
            [(0, 0), (0, 0), (1, 1), (0, 0)])

    def pool_slices(y):
        # 9 strided slices + maximum tree (one fused pointwise pass)
        Bb, Hh, Ww, Cc = y.shape
        Ho, Wo = (Hh + 1) // 2, (Ww + 1) // 2
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        out = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(yp, (0, dy, dx, 0),
                                  (Bb, dy + 2 * Ho - 1, dx + 2 * Wo - 1, Cc),
                                  (1, 2, 2, 1))
                out = s if out is None else jnp.maximum(out, s)
        return out

    x0 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32), jnp.bfloat16)
    xb0 = jax.jit(space_to_depth)(x0)          # (B, H/2, W/2, 12)
    y0 = jax.jit(lambda x: jax.nn.relu(
        conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift))(x0)

    parts = {
        "conv7_relu": (lambda x: jax.nn.relu(
            conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift), x0),
        "conv4_relu_preblocked": (lambda xb: jax.nn.relu(
            conv(xb, k4, (1, 1), [(2, 1), (2, 1)]) + shift), xb0),
        # NB: a bare space_to_depth part would measure nothing — its only
        # consumers would be reductions, which XLA folds straight through
        # transposes/reshapes. Price the transpose as (s2d+conv4) minus
        # conv4_relu_preblocked instead: the conv consumer pins the layout.
        "s2d_then_conv4_relu": (lambda x: jax.nn.relu(
            conv(space_to_depth(x), k4, (1, 1), [(2, 1), (2, 1)])
            + shift), x0),
        "maxpool": (pool, y0),
        "maxpool_sep": (pool_sep, y0),
        "maxpool_slices": (pool_slices, y0),
        "stem_full": (lambda x: pool(jax.nn.relu(
            conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift)), x0),
        "stem_full_sep": (lambda x: pool_sep(jax.nn.relu(
            conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift)), x0),
        "stem_full_slices": (lambda x: pool_slices(jax.nn.relu(
            conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift)), x0),
    }

    # exactness of the pool variants before timing them
    ref = np.asarray(jax.jit(pool)(y0), np.float32)
    for nm, fn in (("sep", pool_sep), ("slices", pool_slices)):
        got = np.asarray(jax.jit(fn)(y0), np.float32)
        assert got.shape == ref.shape and (got == ref).all(), nm

    def scanned(fn):
        # soundness: carry multiplier 1e-6 (not 0) — the body input
        # x + carry is not foldable to x, so iterations can't be elided
        @jax.jit
        def run(x):
            def body(carry, _):
                y = fn(x + carry)
                return jnp.mean(y).astype(x.dtype) * 1e-6, jnp.sum(
                    y.astype(jnp.float32))
            _, sums = jax.lax.scan(body, jnp.bfloat16(0.0), None,
                                   length=scan_iters)
            return jnp.sum(sums)
        return run

    for name, (fn, base) in parts.items():
        run = scanned(fn)
        # (i+1): i=0 would be byte-identical to the warmup dispatch
        rot = [base + jnp.bfloat16(i + 1) * jnp.bfloat16(1e-3)
               for i in range(iters)]
        jax.block_until_ready(rot)
        jax.block_until_ready(run(base))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(run(rot[i]))
            ts.append(time.perf_counter() - t0)
        per_iter = 1000 * min(ts) / scan_iters
        print(json.dumps({"part": name, "B": B,
                          "ms": round(per_iter, 3)}), flush=True)


if __name__ == "__main__":
    main()
