"""XLA compiler-option sweep on the full B=120 train step (MFU tail).

BASELINE.md "r3 roofline": the step is HBM-bound (~38% MFU cap); the
addressable gap is the non-overlapped pointwise tail in the transformer/
fusion stages. These options steer XLA's fusion/VMEM scheduling without
touching model code.

r3 history: the first version of this sweep passed flags via XLA_FLAGS in
fresh subprocesses, which ABORTS on this rig — the relay client's local
XLA build has no TPU compiler, so `parse_flags_from_env` rejects every
TPU flag name before a backend exists. r4 discovery: the PJRT
`compiler_options` argument of `lowered.compile()` ships options INSIDE
the compile request to the server-side compiler, bypassing the client
parse entirely — so the sweep now runs in ONE process: lower the step
once, compile it N times under different option sets, time each
executable (min-of-N, RNG-varied inputs per the relay dedup rule).

Usage:
  python scripts/bench_xla_flags.py [B=120] [accum=4] [steps=4] [smoke=0]

smoke=1: tiny dims on CPU — validates the sweep plumbing (baseline row
must produce a real measurement; the TPU-only option names exercise the
safe-to-fail error path on the CPU compiler).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

OPTION_SETS = {
    "baseline": {},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "aggressive_fusion":
        {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "no_dot_strength_red":
        {"xla_tpu_enable_dot_strength_reduction": "false"},
    "vmem64+aggressive_fusion": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true",
    },
}


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    smoke = bool(int(args.get("smoke", 0)))
    B = int(args.get("B", 4 if smoke else 120))
    accum = int(args.get("accum", 1 if smoke else 4))
    steps = int(args.get("steps", 2 if smoke else 4))

    import jax
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    # FORCE the persistent compile cache off (not just unconfigured): cache
    # keys do not include compiler_options in all jax versions — a hit
    # would silently return the baseline executable for every option set.
    # An env-level JAX_COMPILATION_CACHE_DIR would otherwise re-enable it.
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from gpv_tpu.losses import LossConfig
    from gpv_tpu.models.gpv import GPV
    from gpv_tpu.parallel import create_train_state, make_train_step
    from gpv_tpu.train import build_optimizer
    from gpv_tpu.utils.config import ConfigNode
    from bench_train_step import make_batch

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if smoke:
        bdims = dict(H=48, W=64, S=8, M=4, Tq=5, vocab=64, bert_vocab=100)
        mkw = dict(vocab_size=64, hidden_dim=32, max_text_len=8,
                   co_att_num_layers=1, co_att_heads=4,
                   co_att_intermediate=64, dropout=0.0,
                   text_decoder_layers=1, text_decoder_heads=4,
                   detr_cfg=dict(num_queries=10, num_classes=1,
                                 hidden_dim=32, nheads=4,
                                 num_encoder_layers=1, num_decoder_layers=1,
                                 dim_feedforward=64, dropout=0.0,
                                 backbone_layers=[1, 1, 1, 1]),
                   bert_layers=1, bert_hidden=32, bert_heads=4,
                   bert_vocab_size=100)
    else:
        bdims = {}
        mkw = dict(vocab_size=10000,
                   detr_cfg=dict(num_queries=100, num_classes=1,
                                 hidden_dim=256, nheads=8,
                                 num_encoder_layers=6, num_decoder_layers=6,
                                 dim_feedforward=2048, dropout=0.1))
    training_cfg = ConfigNode({
        "num_epochs": 40, "lr": 1e-4, "lr_backbone": 1e-5,
        "weight_decay": 1e-4, "lr_milestones": [10], "lr_drop": 0.5,
        "lr_warmup": True, "lr_linear_decay": True,
        "lr_warmup_fraction": 0.1, "freeze": False,
    })

    model = GPV(dtype=jnp.bfloat16, **mkw)
    batch_np = make_batch(B, **bdims)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + batch_np["image"].shape[1:3] + (3,), jnp.float32),
        jnp.asarray(batch_np["query_ids"][:1]),
        jnp.asarray(batch_np["answer_ids"][:1]), train=False)
    optimizer = build_optimizer(training_cfg, steps_per_epoch=1000,
                                params=variables["params"])
    state = create_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, LossConfig(), 0.1,
                           mesh=None, donate=False, grad_accum=accum)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(1)

    lowered = step.lower(state, batch, rng)

    for name, opts in OPTION_SETS.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(
                compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(json.dumps({"flags": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        try:
            # warm + timed calls; RNG varied per call so the relay cannot
            # serve a cached dispatch; fetch a host float to sync
            _, losses = compiled(state, batch, jax.random.fold_in(rng, 999))
            float(losses["total_loss"])
            ts = []
            for i in range(steps):
                t0 = time.perf_counter()
                _, losses = compiled(state, batch,
                                     jax.random.fold_in(rng, i))
                total = float(losses["total_loss"])
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000
            print(json.dumps({
                "flags": name, "B": B, "grad_accum": accum,
                "ms_per_step": round(ms, 1),
                "img_per_sec": round(B / (ms / 1000), 1),
                "compile_s": round(compile_s, 1),
                "total_loss": round(total, 3),
                "all_ms": [round(t * 1000, 1) for t in ts],
            }), flush=True)
        except Exception as e:
            print(json.dumps({"flags": name,
                              "error": f"run: {type(e).__name__}: {e}"[:300]
                              }), flush=True)


if __name__ == "__main__":
    main()
