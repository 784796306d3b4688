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
