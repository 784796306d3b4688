"""gpv_tpu — a TPU-native rebuild of GPV-1 (General Purpose Vision).

A multi-task vision-language framework: one image + one natural-language query
-> 100 candidate boxes, per-box relevance, and a free-form text answer, with
joint training on VQA / Captioning / Localization / Classification and
RefCOCO+ finetuning.

Design: JAX/XLA/Pallas compute path (single jitted graph per task shape,
static shapes everywhere, bf16-on-MXU friendly), `jax.sharding.Mesh` + jit
data parallelism, optax optimizers, orbax checkpoints, and a hydra-compatible
first-party config engine.

Reference behavior spec: allenai/gpv-1 (see SURVEY.md). This is a from-scratch
TPU-first implementation, not a port.
"""

__version__ = "0.1.0"

# Lazy top-level API: the serving/client classes are import-light, but the
# engine pulls jax/flax — keep `import gpv_tpu` cheap for client-only hosts
# (gpv_tpu.client needs no accelerator stack at all).
_LAZY = {
    "GPVEngine": "gpv_tpu.engine",
    "GPVServer": "gpv_tpu.serve",
    "GPVClient": "gpv_tpu.client",
    "ExportedEngine": "gpv_tpu.export",
    "export_engine": "gpv_tpu.export",
    "Trainer": "gpv_tpu.train.trainer",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'gpv_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
