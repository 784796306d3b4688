"""COCO task datasets (host side): sample JSONs -> augmented fixed-size images
+ queries + targets.

Behavior spec: reference `datasets/coco_generic_dataset.py` and
`datasets/coco_datasets.py` —
  GenericCocoDataset: loads per-subset sample JSON; reads image (grayscale ->
  3ch), resizes to the fixed task image_size (480x640); targets carry
  normalized cxcywh boxes + zero labels when the sample has boxes, the answer
  string when it has one, and the task name.
  CocoVqa: resamples the answer from `all_answers` entries with freq > 2.
  CocoClassification: crops the object box with a 0.2*w/h margin (min 5 px)
  before resizing; no box targets.
  Test-server variants: VQA test/testdev, captioning val/test with per-image
  dedup.

TPU note: images come back as fixed-size uint8 HWC; float conversion +
ImageNet normalization happen on device (`gpv_tpu.ops.image`), folded into
the jitted graph per the north star.
"""
from __future__ import annotations

import json
import warnings
from pathlib import Path
from typing import Any, Dict, List

import numpy as np
from PIL import Image

from .transforms import Compose, eval_transforms, train_transforms


def load_image(path: str | Path) -> np.ndarray:
    """-> (H, W, 3) uint8; grayscale tiled to 3 channels, alpha dropped."""
    img = np.asarray(Image.open(path))
    if img.ndim == 2:
        img = np.tile(img[:, :, None], (1, 1, 3))
    return img[:, :, :3]


_native_resize = None
_warned_no_native = False


def _get_native_resize():
    """Native C++ resize kernel when buildable (gpv_tpu/native), else None."""
    global _native_resize
    if _native_resize is None:
        try:
            from ..native import resize_bilinear_native
            _native_resize = resize_bilinear_native
        except Exception:
            _native_resize = False
    return _native_resize or None


def resize_uint8(img: np.ndarray, h: int, w: int,
                 method: str = "pil") -> np.ndarray:
    """Host resize to uint8. Methods:

    - "pil" (default): PIL bilinear — fast (~5 ms/img); interior divergence
      from the reference path is at uint8-quantization level for upscales
      and <=0.1 for downscales, border row/col up to ~0.4 on hard edges
      (PIL edge-clamps, skimage mirrors) — measured in
      tests/test_skimage_resize.py, recorded PARITY.md #7.
    - "native": C++ point-sampled bilinear (fastest; training pipeline,
      where augmentation noise dominates). Falls back to "pil" with a
      one-time warning when the in-tree kernel isn't built on this host.
    - "exact": skimage-0.17.2-exact anti-aliased path (the reference's
      eval pixels, `datasets/coco_generic_dataset.py:61`) rounded to uint8
      — residual divergence <= 1/510 per pixel; ~100-300 ms/img fp64, the
      cost the reference itself paid per image. Use for released-checkpoint
      numeric parity (cli/check_parity.py defaults to it).
    """
    if method not in ("pil", "native", "exact"):
        raise ValueError(f"unknown resize method {method!r}")
    if method == "native":
        fn = _get_native_resize()
        if fn is not None:
            return fn(img.astype(np.uint8), h, w)
        global _warned_no_native
        if not _warned_no_native:
            _warned_no_native = True
            warnings.warn("host_resize: native requested but the "
                          "gpv_tpu/native kernel is not built on this "
                          "host; falling back to PIL bilinear")
    elif method == "exact":
        from ..data.skimage_resize import skimage_resize_exact
        out = skimage_resize_exact(img.astype(np.uint8), (h, w),
                                   anti_aliasing=True)
        return np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)
    return np.asarray(
        Image.fromarray(img.astype(np.uint8)).resize((w, h),
                                                     Image.BILINEAR))


def coco_image_path(image_dir: str, subset: str, image_id: int) -> Path:
    return (Path(image_dir) / subset
            / f"COCO_{subset}_{int(image_id):012d}.jpg")


class GenericCocoDataset:
    """One task's sample list. `task` tags targets like the reference
    subclasses do."""

    task: str = "Generic"
    has_box_targets: bool = True

    def __init__(self, cfg, subset: str, training: bool = False):
        self.cfg = cfg
        self.subset = subset
        self.training = training
        self.imh = int(cfg.image_size.H)
        self.imw = int(cfg.image_size.W)
        self.read_image = bool(cfg.get("read_image", True))
        # host_resize: pil (default) | native | exact — see resize_uint8
        self.resize_method = str(cfg.get("host_resize", "pil"))
        samples = json.loads(Path(cfg.samples[subset]).read_text())
        max_samples = (cfg.get("max_samples") or {}).get(subset)
        if max_samples is not None:
            samples = samples[:int(max_samples)]
        self.samples: List[Dict[str, Any]] = samples
        self.transforms: Compose = (train_transforms(self.task) if training
                                    else eval_transforms())

    def __len__(self):
        return len(self.samples)

    def _read(self, sample) -> tuple[np.ndarray, tuple[int, int]]:
        path = coco_image_path(self.cfg.image_dir,
                               sample["image"]["subset"],
                               sample["image"]["image_id"])
        img = load_image(path)
        original_size = img.shape[:2]
        img = resize_uint8(img, self.imh, self.imw,
                           method=self.resize_method)
        return img, original_size

    def get_boxes_cxcywh(self, coco_boxes) -> np.ndarray:
        boxes = np.asarray(coco_boxes, np.float32).reshape(-1, 4)
        out = boxes.copy()
        out[:, 0] = boxes[:, 0] + 0.5 * boxes[:, 2]
        out[:, 1] = boxes[:, 1] + 0.5 * boxes[:, 3]
        return out

    def __getitem__(self, i: int):
        return self.get(i, np.random.RandomState())

    def get(self, i: int, rng: np.random.RandomState) -> Dict[str, Any]:
        sample = self.samples[i]
        out: Dict[str, Any] = {"query": sample["query"], "task": self.task,
                               "sample": sample}
        if self.read_image:
            img, (H, W) = self._read(sample)
            out["image"] = self.transforms(img, rng).astype(np.uint8)
            out["original_size"] = (H, W)
            if self.has_box_targets and "boxes" in sample:
                b = self.get_boxes_cxcywh(sample["boxes"])
                b[:, 0] /= W
                b[:, 1] /= H
                b[:, 2] /= W
                b[:, 3] /= H
                out["boxes"] = b
        elif self.has_box_targets and "boxes" in sample:
            out["boxes"] = self.get_boxes_cxcywh(sample["boxes"])
        if "answer" in sample:
            out["answer"] = sample["answer"]
        return out


class CocoCaptioning(GenericCocoDataset):
    task = "CocoCaptioning"


class CocoDetection(GenericCocoDataset):
    task = "CocoDetection"


class RefCocop(GenericCocoDataset):
    task = "RefCocop"


class CocoVqa(GenericCocoDataset):
    task = "CocoVqa"
    has_box_targets = False

    def get(self, i, rng):
        out = super().get(i, rng)
        sample = self.samples[i]
        if self.training:
            pool = []
            for answer, freq in sample.get("all_answers", {}).items():
                if freq > 2:
                    pool.extend([answer] * freq)
            if pool:
                out["answer"] = pool[rng.randint(len(pool))]
        return out


class CocoClassification(GenericCocoDataset):
    task = "CocoClassification"
    has_box_targets = False

    def _read(self, sample):
        path = coco_image_path(self.cfg.image_dir,
                               sample["image"]["subset"],
                               sample["image"]["image_id"])
        img = load_image(path)
        H, W = img.shape[:2]
        x, y, w, h = sample["boxes"]
        w, h = max(w, 5), max(h, 5)
        x1 = min(max(0, int(x - 0.2 * w)), W)
        x2 = min(max(0, int(x + 1.2 * w)), W)
        y1 = min(max(0, int(y - 0.2 * h)), H)
        y2 = min(max(0, int(y + 1.2 * h)), H)
        crop = img[y1:y2, x1:x2]
        original_size = crop.shape[:2]
        return (resize_uint8(crop, self.imh, self.imw,
                             method=self.resize_method), original_size)


class CocoVqaTestOriginalSplit(CocoVqa):
    """VQA test-server split: queries only, no targets."""

    def get(self, i, rng):
        out = super().get(i, rng)
        out.pop("answer", None)
        return out


class CocoCapTestOriginalSplit(CocoCaptioning):
    """Captioning test-server split; val is deduplicated per image."""

    def __init__(self, cfg, subset, training=False):
        super().__init__(cfg, subset, training)
        if subset == "val":
            dedup = {}
            for s in self.samples:
                dedup[s["image"]["image_id"]] = s
            self.samples = list(dedup.values())

    def get(self, i, rng):
        out = super().get(i, rng)
        out.pop("answer", None)
        out.pop("boxes", None)
        return out


DATASET_CLASSES = {
    "CocoCaptioning": CocoCaptioning,
    "CocoDetection": CocoDetection,
    "CocoClassification": CocoClassification,
    "CocoVqa": CocoVqa,
    "RefCocop": RefCocop,
    "CocoVqaTestOriginalSplitDataset": CocoVqaTestOriginalSplit,
    "CocoCapTestOriginalSplitDataset": CocoCapTestOriginalSplit,
}


class CocoMultitaskDataset:
    """Concatenation over task datasets with cumulative index ranges
    (reference `datasets/coco_multitask_dataset.py:9-49`)."""

    def __init__(self, learning_datasets_cfg, task_configs, subset: str,
                 training: bool = False):
        self.datasets: List[GenericCocoDataset] = []
        self.names: List[str] = []
        for cls_name, ds_cfg in learning_datasets_cfg.items():
            task_cfg = task_configs[ds_cfg.task_config]
            ds = DATASET_CLASSES[cls_name](task_cfg, subset, training)
            self.datasets.append(ds)
            self.names.append(cls_name)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def get(self, i: int, rng: np.random.RandomState):
        k = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.datasets[k].get(i - int(self.offsets[k]), rng)

    def __getitem__(self, i):
        return self.get(i, np.random.RandomState())
