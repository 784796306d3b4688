"""On-device image preprocessing (fold resize/normalize into the jitted graph).

Behavior spec: reference `datasets/coco_generic_dataset.py:49-62` (skimage
resize to a fixed 480x640 with anti-aliasing, grayscale -> 3ch) and the
torchvision `ToTensor` + ImageNet `Normalize` transforms (`:26-39`). On TPU we
run resize + normalize as XLA ops inside the jitted graph instead of host-side
PIL/skimage glue (BASELINE north star).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_image(img: jnp.ndarray, height: int = 480, width: int = 640,
                 antialias: bool = True) -> jnp.ndarray:
    """Resize (..., H, W, C) image(s) to (..., height, width, C), linear.

    Anti-aliased on downscale, matching skimage's `anti_aliasing=True` intent
    (exact Gaussian-prefilter parity is not required: this feeds a learned
    network, and our golden tests gate end-to-end metrics, not resample bits).
    """
    shape = (*img.shape[:-3], height, width, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear",
                            antialias=antialias)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Normalize (..., 3) float images in [0,1] with ImageNet stats."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return (img - mean) / std


def preprocess(img_uint8: jnp.ndarray, height: int = 480, width: int = 640,
               resize: bool = True) -> jnp.ndarray:
    """uint8 (..., H, W, 3) -> normalized fp32, optionally resized."""
    x = img_uint8.astype(jnp.float32) / 255.0
    if resize:
        x = resize_image(x, height, width)
    return normalize_image(x)
