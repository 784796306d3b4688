"""Attribute HBM traffic in the compiled train-step HLO to model modules.

Lowers the same full-fwd / fwd+bwd graphs as bench_mfu_breakdown, then
parses the OPTIMIZED HLO text: every op whose output tensor is >= min_mb
is bucketed by its `metadata.op_name` JAX module path (e.g.
"...GPV/detr/transformer/..."), giving a ranked table of which modules
materialize the big buffers — the ground truth behind the
non-backbone ~40 GB/step XLA byte count (BASELINE.md r3 roofline).

Usage: python scripts/hbm_map.py [B=120] [stage=fwd|fwd_bwd] [min_mb=8] [top=40]
"""
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}

SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s64|u64|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def tensor_bytes(text: str) -> int:
    """Sum the sizes of all shapes in an HLO result type string."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def module_key(op_name: str) -> str:
    """Collapse a jit(...)/GPV/detr/transformer/... path to a short bucket."""
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    # drop trailing primitive name (dot_general, add, ...), keep module path
    path = [p for p in parts if not p.startswith(("jvp(", "transpose("))]
    keep = []
    for p in parts:
        p = p.replace("jvp(", "").replace("transpose(", "").rstrip(")")
        keep.append(p)
    return "/".join(keep[:4]) if keep else "(none)"


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
    stage = args.get("stage", "fwd")
    min_mb = float(args.get("min_mb", 8))
    top = int(args.get("top", 40))

    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    model = GPV(vocab_size=10000, detr_cfg=detr_cfg, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 480, 640, 3), jnp.float32),
                           jnp.zeros((1, 12), jnp.int32),
                           jnp.zeros((1, 20), jnp.int32), train=False))
    batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
             for k, v in make_batch(B).items()}
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    cfg = LossConfig()

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

    fn = fwd if stage == "fwd" else fwd_bwd
    compiled = jax.jit(fn).lower(variables, batch, rng).compile()
    hlo = compiled.as_text()
    print(f"# optimized HLO: {len(hlo.splitlines())} lines", file=sys.stderr)

    by_module = defaultdict(lambda: [0, 0])  # bytes, count
    rows = []
    for line in hlo.splitlines():
        line = line.strip()
        # op results look like: %name = TYPE op(...), metadata={...}
        if not line.startswith("%") or "= " not in line:
            continue
        lhs, rhs = line.split("= ", 1)
        # result type = everything up to the opcode's '('
        head = rhs.split("(", 1)[0]
        ty_match = SHAPE_RE.search(head)
        if not ty_match:
            continue
        # only the RESULT type (before opcode token at end of head)
        result_ty = head.rsplit(" ", 1)[0] if " " in head else head
        nbytes = tensor_bytes(result_ty)
        if nbytes < min_mb * 1e6:
            continue
        opname = OPNAME_RE.search(line)
        key = module_key(opname.group(1)) if opname else "(no-metadata)"
        opcode = head.rsplit(" ", 1)[-1]
        by_module[key][0] += nbytes
        by_module[key][1] += 1
        rows.append((nbytes, opcode, key, result_ty[:60]))

    rows.sort(reverse=True)
    print(f"\n## top {top} largest materialized results (>= {min_mb} MB), "
          f"stage={stage} B={B}")
    for nbytes, opcode, key, ty in rows[:top]:
        print(f"{nbytes/1e6:9.1f} MB  {opcode:28s} {key:48s} {ty}")

    print("\n## bytes by module (big-tensor results only)")
    for key, (nbytes, cnt) in sorted(by_module.items(),
                                     key=lambda kv: -kv[1][0])[:top]:
        print(f"{nbytes/1e9:8.2f} GB  ({cnt:3d} ops)  {key}")


if __name__ == "__main__":
    main()
