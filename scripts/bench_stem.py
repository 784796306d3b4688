"""ResNet stem on the chip: 7x7/s2 (C_in=3) vs exact space-to-depth rewrite.

The stem is the one conv the MXU can't tile (3 input channels on a
128-lane array). ops/stem_s2d.py rewrites it exactly; this measures
whether the rewrite wins on real hardware before it's wired into the
serving path. Each timed row is a single dispatch running `scan_iters`
chained stem applications (RTT-amortized, the bench_train_step pattern);
inputs vary per dispatch so the relay dedup cache can't serve fakes.

Usage: python scripts/bench_stem.py [batches=20,64] [iters=6] [scan_iters=20]
Prints one JSON row per (batch, variant).
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
    batches = [int(x) for x in args.get("batches", "20,64").split(",")]
    iters = int(args.get("iters", 6))
    scan_iters = int(args.get("scan_iters", 20))

    rng = np.random.RandomState(0)
    k7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32),
                     jnp.bfloat16)
    k4 = jnp.asarray(s2d_stem_kernel(np.asarray(k7, np.float32)),
                     jnp.bfloat16)
    shift = jnp.asarray(rng.randn(64).astype(np.float32), jnp.bfloat16)

    def conv(x, k, strides, padding):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stem_plain(x):
        y = jax.nn.relu(conv(x, k7, (2, 2), [(3, 3), (3, 3)]) + shift)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def stem_s2d(x):
        y = jax.nn.relu(conv(space_to_depth(x), k4, (1, 1),
                             [(2, 1), (2, 1)]) + shift)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def scanned(stem):
        # chain iterations through a data dependence (fold the pooled
        # mean back into the next input) so XLA can't parallelize or
        # elide the repeats; checksum output forces a real device sync.
        # Soundness: the carry multiplier is 1e-6 (NOT 0), so carry+x is
        # not foldable to x and the body is not loop-invariant — each
        # iteration's stem input genuinely differs (cf. BASELINE.md "r4
        # hardware calibration" for the x+s*0 pattern that DOES elide)
        @jax.jit
        def fn(x):
            def body(carry, _):
                y = stem(x + carry)
                return jnp.mean(y).astype(x.dtype) * 1e-6, jnp.sum(
                    y.astype(jnp.float32))
            _, sums = jax.lax.scan(body, jnp.bfloat16(0.0), None,
                                   length=scan_iters)
            return jnp.sum(sums)
        return fn

    for B in batches:
        x0 = jnp.asarray(
            rng.randn(B, H, W, 3).astype(np.float32), jnp.bfloat16)
        # (i+1): i=0 would be byte-identical to the warmup input (relay
        # dedup cache would serve it and min-of-N would pick the fake)
        xs = [x0 + jnp.bfloat16(i + 1) * jnp.bfloat16(1e-3)
              for i in range(iters)]
        jax.block_until_ready(xs)
        for name, stem in (("stem7x7", stem_plain), ("stem_s2d", stem_s2d)):
            fn = scanned(stem)
            jax.block_until_ready(fn(x0))  # compile
            ts = []
            for i in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(xs[i]))
                ts.append(time.perf_counter() - t0)
            wall_ms = 1000 * min(ts)
            per_iter = wall_ms / scan_iters
            flops = B * (H // 2) * (W // 2) * 64 * 7 * 7 * 3 * 2
            print(json.dumps({
                "stage": name, "B": B, "wall_ms": round(wall_ms, 2),
                "ms_per_stem": round(per_iter, 3),
                "tflops": round(flops / per_iter / 1e9, 1),
                "scan_iters": scan_iters}), flush=True)


if __name__ == "__main__":
    main()
