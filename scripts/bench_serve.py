"""Serving latency SLO bench (VERDICT r2 item 7).

Drives GPVServer with an OPEN-LOOP Poisson arrival process (arrivals are
scheduled on a clock, independent of completions — the honest serving
model) at 25/50/90% of the measured saturation throughput, for max batch
20 (reference eval size) and 64 (throughput sweet spot), with the
small-batch executable fallback (buckets 1/8/B). Reports p50/p99 request
latency per point, measured from SCHEDULED arrival to future resolution.

Usage: python scripts/bench_serve.py [batches=20,64] [n=800]
                                     [utils=0.25,0.5,0.9] [beam=K]
Prints one JSON row per (batch, utilization) point, then a summary table.
beam=K runs the whole sweep through the beam-search serving path.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 480, 640
VOCAB = 10000


def build_engine():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from gpv_tpu.engine import GPVEngine
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.text.vocab import AnswerVocab
    from gpv_tpu.text.wordpiece import WordPieceTokenizer

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=VOCAB, max_text_len=20, detr_cfg=detr_cfg,
                dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, 20), jnp.int32), train=False)
    vocab = AnswerVocab.debug(size=VOCAB)
    eng = GPVEngine(model, None, vocab, WordPieceTokenizer.debug())
    eng.variables = variables  # triggers serving-path BN folding
    return eng


def measure_capacity(server, images, n_burst=240, beam=None):
    """Closed-loop saturation: submit a burst, measure completion rate."""
    futs = [server.submit(images[i % len(images)], f"what is item {i}?",
                          beam_size=beam)
            for i in range(n_burst)]
    t0 = time.perf_counter()
    for f in futs:
        f.result(timeout=600)
    # first-batch latency is already warm (warmup compiled every bucket)
    return n_burst / (time.perf_counter() - t0)


def run_poisson(server, images, rate_hz, n_req, seed=0, beam=None):
    """Open-loop Poisson arrivals at rate_hz; returns latencies (s).

    Each request's completion is timestamped in a done-callback (fires on
    the worker thread at set_result time) — timing at collection would
    charge early requests the whole run duration.
    """
    rng = np.random.RandomState(seed)
    gaps = rng.exponential(1.0 / rate_hz, size=n_req)
    arrivals = np.cumsum(gaps)
    done_at = [None] * n_req
    futs = [None] * n_req
    t_start = time.perf_counter()

    def _stamp(i):
        def cb(_fut):
            done_at[i] = time.perf_counter() - t_start
        return cb

    lag_max = 0.0
    for i in range(n_req):
        now = time.perf_counter() - t_start
        wait = arrivals[i] - now
        if wait > 0:
            time.sleep(wait)
        else:
            lag_max = max(lag_max, -wait)
        futs[i] = server.submit(images[i % len(images)],
                                f"describe object {i % 31}",
                                beam_size=beam)
        futs[i].add_done_callback(_stamp(i))
    for fut in futs:
        fut.result(timeout=600)
    lats = np.asarray(done_at) - arrivals
    return lats, lag_max


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    batches = [int(b) for b in args.get("batches", "20,64").split(",")]
    n_req = int(args.get("n", 800))
    utils = [float(u) for u in args.get("utils", "0.25,0.5,0.9").split(",")]
    # beam=K: run the whole SLO sweep through the beam path (BASELINE
    # config #4 as a SERVING workload, not just offline eval)
    beam = args.get("beam")
    beam = int(beam) if beam else None

    from gpv_tpu.serve import GPVServer
    eng = build_engine()
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(32)]

    rows = []
    for B in batches:
        buckets = sorted({1, 8, B})
        # in beam mode skip the server's greedy warmup entirely: an
        # all-beam sweep never runs those executables, and each unused
        # greedy compile costs minutes through the relay
        server = GPVServer(eng, max_wait_ms=5.0, num_workers=2,
                           bucket_sizes=buckets,
                           warmup=None if beam else (H, W))
        if beam:
            # compile the beam executable per bucket before any timed work
            for b in buckets:
                eng.predict_beam(np.zeros((b, H, W, 3), np.uint8),
                                 ["warm up"] * b, beam_size=beam)
        cap = measure_capacity(server, images, n_burst=12 * B, beam=beam)
        print(json.dumps({"batch": B, "buckets": buckets, "beam": beam,
                          "capacity_img_per_sec": round(cap, 1)}),
              flush=True)
        for u in utils:
            rate = u * cap
            lats, lag = run_poisson(server, images, rate, n_req,
                                    seed=int(u * 100), beam=beam)
            row = {"batch": B, "util": u, "beam": beam,
                   "offered_req_per_sec": round(rate, 1),
                   "p50_ms": round(1000 * float(np.percentile(lats, 50)), 1),
                   "p90_ms": round(1000 * float(np.percentile(lats, 90)), 1),
                   "p99_ms": round(1000 * float(np.percentile(lats, 99)), 1),
                   "max_ms": round(1000 * float(lats.max()), 1),
                   "submitter_max_lag_ms": round(1000 * lag, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        # server-side view of the same run: occupancy (pad waste) and
        # per-bucket batch mix (GPVServer.stats)
        s = server.stats()
        print(json.dumps({"batch": B, "server_stats": {
            "batch_occupancy": s["batch_occupancy"],
            "batches_per_bucket": s["batches_per_bucket"],
            "mask_deferrals": s["mask_deferrals"]}}), flush=True)
        server.close()

    print("\n| B | util | offered req/s | p50 ms | p90 ms | p99 ms |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {int(r['util']*100)}% | "
              f"{r['offered_req_per_sec']} | {r['p50_ms']} | "
              f"{r['p90_ms']} | {r['p99_ms']} |")


if __name__ == "__main__":
    main()
