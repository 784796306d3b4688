"""Inference helpers (public surface parity with reference
`inference_util.py`: `read_image` with a resize toggle, `vis_sample`)."""
from __future__ import annotations

import numpy as np

from gpv_tpu.datasets.coco import load_image, resize_uint8
from gpv_tpu.utils.visualize import vis_sample as _vis_sample


def read_image(image_path: str, resize_image: bool = True,
               imh: int = 480, imw: int = 640,
               method: str = "pil") -> np.ndarray:
    """-> (H, W, 3) uint8; optionally resized to the task 480x640.

    method="exact" reproduces the reference's skimage-0.17.2 anti-aliased
    pixels (reference inference_util.py:22) up to uint8 rounding."""
    img = load_image(image_path)
    if resize_image:
        img = resize_uint8(img, imh, imw, method=method)
    return img


def vis_sample(image_uint8, boxes_cxcywh, relevance, num_boxes: int = 5,
               answer: str = ""):
    """Draw the top predicted boxes; returns a PIL image."""
    return _vis_sample(image_uint8, boxes_cxcywh, relevance,
                       num_boxes=num_boxes, answer=answer)


def imshow(img):
    """Display an image in a notebook (IPython) or save to /tmp otherwise
    (reference inference_util.imshow, cv2->IPython)."""
    from PIL import Image
    pil = img if isinstance(img, Image.Image) else \
        Image.fromarray(np.asarray(img).astype(np.uint8))
    try:
        from IPython.display import display
        display(pil)
    except Exception:
        pil.save("/tmp/gpv_imshow.jpg")
        print("image saved to /tmp/gpv_imshow.jpg")
