"""Frozen-BatchNorm weight folding (serving-path optimization).

The backbone's BN layers are frozen affine transforms (FrozenBatchNorm):
`y = conv(x, W) * scale + shift` with scale/shift fixed. Folding rewrites
this as `y = conv(x, W * scale) + shift`, eliminating the per-activation
multiply — profiling shows BN/residual elementwise traffic is ~24% of
GPV encode time while the convs themselves already run at MXU peak.

`fold_frozen_bn(params, batch_stats)` folds the multiplicative part into
the conv KERNEL (the convs are bias-free) and leaves only the additive
shift in the BN (scale becomes exactly 1, which XLA folds away; the add
fuses with the surrounding residual/ReLU fusions). The model graph is
unchanged, so the same jitted function serves folded and unfolded weights.

Inference-only: folding changes gradient structure, so training keeps the
unfolded form.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

EPS = 1e-5

# conv-name -> bn-name pairing inside each module level (ResNet naming from
# gpv_tpu/nn/resnet.py)
_PAIRS = {
    "conv1": "bn1",
    "conv2": "bn2",
    "conv3": "bn3",
    "downsample_conv": "downsample_bn",
}


def _fold_level(params: dict, stats: dict) -> None:
    """Fold all conv/bn pairs at this dict level, then recurse (in place)."""
    for conv_name, bn_name in _PAIRS.items():
        if conv_name in params and bn_name in stats:
            bn = stats[bn_name]
            scale = np.asarray(bn["weight"]) / np.sqrt(
                np.asarray(bn["running_var"]) + EPS)
            shift = (np.asarray(bn["bias"])
                     - np.asarray(bn["running_mean"]) * scale)
            conv = params[conv_name]
            kernel = np.asarray(conv["kernel"]) * scale  # HWIO * (O,)
            params[conv_name] = dict(conv)
            params[conv_name]["kernel"] = kernel.astype(
                np.asarray(conv["kernel"]).dtype)
            # identity scale: var + EPS == 1 exactly => scale factor 1
            stats[bn_name] = {
                "weight": np.ones_like(scale, np.float32),
                "bias": shift.astype(np.float32),
                "running_mean": np.zeros_like(scale, np.float32),
                "running_var": np.ones_like(scale, np.float32) - EPS,
            }
    for k, v in params.items():
        if isinstance(v, dict) and k not in _PAIRS:
            sub_stats = stats.get(k)
            if isinstance(sub_stats, dict):
                _fold_level(v, sub_stats)


def fold_frozen_bn(params, batch_stats) -> Tuple[dict, dict]:
    """Return (params, batch_stats) with conv+FrozenBN pairs folded.

    Works on any pytree produced by gpv_tpu models (host-side numpy copy).
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    # deep-copy containers (tree.map copies leaves; dicts rebuilt below)
    import copy
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    _fold_level(params, batch_stats)
    return params, batch_stats
