"""Host input-pipeline benchmark: decode + resize + augment + collate img/s.

Answers VERDICT round-1 item 5: can the host loader feed the device rate
(~900 img/s on one v5e chip for inference; training consumes ~120 img per
global batch)?  The reference runs 30 decode workers per GPU
(`exp/gpv/train_distr.py:213-222`); here one process feeds the whole mesh.

Usage:  python scripts/bench_host_pipeline.py [n_images=400] [batch=120]
Prints one line per worker count + a JSON summary; record in BASELINE.md.
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_data(root: Path, n_images: int):
    img_dir = root / "images/train2014"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(n_images):
        # realistic COCO-ish sizes; non-uniform so resize always runs
        sizes = [(480, 640), (427, 640), (612, 612), (640, 426)]
        h, w = sizes[rng.randint(len(sizes))]
        # smooth-ish content so JPEG size/decoding cost is realistic
        base = rng.randint(0, 255, (h // 8, w // 8, 3), np.uint8)
        arr = np.asarray(Image.fromarray(base).resize((w, h)))
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{i:012d}.jpg",
                                  quality=90)
    samples = [{
        "query": "locate the dog",
        "boxes": [[10, 10, 200, 150], [300, 200, 100, 120]],
        "id": i, "category_id": 18, "category_name": "dog",
        "image": {"subset": "train2014", "image_id": i % n_images},
        "coco_categories": {"seen": ["dog"], "unseen": []},
    } for i in range(max(n_images, 2000))]
    (root / "det.json").write_text(json.dumps(samples))
    return root / "det.json", root / "images"


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    n_images = int(args.get("n_images", 400))
    batch = int(args.get("batch", 120))
    workers_list = [int(x) for x in
                    args.get("workers", "4,8,16,32").split(",")]

    from gpv_tpu.datasets.coco import CocoDetection
    from gpv_tpu.datasets.loader import Collator, DataLoader
    from gpv_tpu.text.vocab import AnswerVocab
    from gpv_tpu.text.wordpiece import WordPieceTokenizer
    from gpv_tpu.utils.config import ConfigNode

    root = Path(tempfile.mkdtemp(prefix="gpv_hostbench_"))
    print(f"synthesizing {n_images} jpegs...", flush=True)
    samples_json, image_dir = make_data(root, n_images)

    cfg = ConfigNode({
        "image_size": ConfigNode({"H": 480, "W": 640}),
        "image_dir": str(image_dir),
        "samples": ConfigNode({"train": str(samples_json)}),
    })
    ds = CocoDetection(cfg, "train", training=True)  # strongest augs
    col = Collator(AnswerVocab.debug(), WordPieceTokenizer.debug(),
                   max_text_len=20, max_target_boxes=8)

    results = {}
    for nw in workers_list:
        loader = DataLoader(ds, col, batch_size=batch, num_workers=nw,
                            seed=0)
        it = iter(loader)
        next(it)  # warm-up batch
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += b["image"].shape[0]
            if n >= 1200:
                break
        dt = time.perf_counter() - t0
        rate = n / dt
        results[nw] = rate
        print(f"workers={nw:3d}: {rate:8.1f} img/s "
              f"({n} imgs in {dt:.2f}s)", flush=True)

    best = max(results.values())
    print(json.dumps({
        "metric": "host_pipeline_images_per_sec", "value": round(best, 1),
        "unit": "images/sec", "batch": batch,
        "per_workers": {str(k): round(v, 1) for k, v in results.items()},
        "device_rate_to_beat": 909.0}))


if __name__ == "__main__":
    main()
