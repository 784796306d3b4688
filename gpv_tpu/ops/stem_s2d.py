"""Space-to-depth stem transform (serving-path optimization, exact).

The ResNet stem conv (7x7, stride 2, C_in=3) is the one conv in the tower
the MXU cannot tile well: 3 input channels against a 128-lane systolic
array. The MLPerf-ResNet space-to-depth trick rewrites it exactly:

  conv7x7/s2/pad3 over (H, W, 3)
    == conv4x4/s1/pad(2,1) over space_to_depth_2x2(x): (H/2, W/2, 12)

with the 7x7 kernel zero-padded to 8x8 (one leading zero tap per axis,
because pad=3 means the receptive field starts at offset -3, and the
2x2 blocks align at even offsets -4..3) and rearranged into blocked
(4, 4, 12, C_out) form. Same multiply-adds (plus zero taps), so outputs
match to float-reassociation error; checkpoint parity is preserved by
transforming the WEIGHTS, never retraining.

Derivation of the blocked kernel index map: output position o of the
original conv reads input rows 2o-3..2o+3, which live in 2-blocks
j = o-2..o+1 (4 taps, so pad_lo=2, pad_hi=1); blocked tap t covers
original kernel index ky = 2t + dy - 1 for in-block offset dy in {0,1}
(ky = -1 and any index > 6 are the zero taps).

Composes with `fold_frozen_bn` in either order (folding scales the kernel
per output channel; this transform only permutes kernel entries).

Behavior spec: the stem this replaces is reference
`exp/gpv/models/backbone.py:82-99` (torchvision resnet50 conv1); the
transform itself has no reference counterpart — it is a TPU-side
serving-graph rewrite with tested numerical parity.
"""
from __future__ import annotations

import numpy as np


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4*C), channel layout (dy*2+dx)*C + c.

    H and W must be even (static shapes; callers gate on this).
    """
    import jax.numpy as jnp
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(
            f"space_to_depth needs even spatial dims, got {H}x{W}")
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B, H/2, W/2, dy, dx, C)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def s2d_stem_kernel(kernel) -> np.ndarray:
    """Rewrite a (7, 7, C, O) HWIO stride-2 stem kernel to the equivalent
    (4, 4, 4*C, O) stride-1 kernel over space_to_depth input."""
    kernel = np.asarray(kernel)
    kh, kw, C, O = kernel.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"expected a 7x7 stem kernel, got {kh}x{kw}")
    out = np.zeros((4, 4, 4 * C, O), kernel.dtype)
    for ty in range(4):
        for dy in range(2):
            ky = 2 * ty + dy - 1
            if not 0 <= ky <= 6:
                continue
            for tx in range(4):
                for dx in range(2):
                    kx = 2 * tx + dx - 1
                    if not 0 <= kx <= 6:
                        continue
                    blk = (dy * 2 + dx) * C
                    out[ty, tx, blk:blk + C] = kernel[ky, kx]
    return out


def apply_stem_s2d(params: dict) -> dict:
    """Return a copy of a GPV/DETR/ResNet params tree with every stem
    `conv1` kernel of shape (7, 7, C, O) rewritten for the s2d stem.

    Pair with building the model with `stem_s2d=True` (ResNet/DETR flag or
    `model.detr.stem_s2d` config key). Host-side numpy, like fold_bn.
    """
    hits = []

    def walk(node):
        if not isinstance(node, dict):
            return node
        new = {}
        for k, v in node.items():
            if (k == "conv1" and isinstance(v, dict) and "kernel" in v
                    and getattr(np.asarray(v["kernel"]), "ndim", 0) == 4
                    and np.asarray(v["kernel"]).shape[:2] == (7, 7)):
                new[k] = dict(v)
                new[k]["kernel"] = s2d_stem_kernel(v["kernel"])
                hits.append(k)
            else:
                new[k] = walk(v)
        return new

    out = walk(params)
    if not hits:
        raise ValueError("apply_stem_s2d: no 7x7 conv1 stem kernel found "
                         "(already transformed, or not a ResNet tree?)")
    return out
