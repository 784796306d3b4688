"""Offline-eval loader throughput: sequential vs threads vs processes.

Measures `iter_padded_batches` item throughput over a synthetic on-disk
image set (JPEG decode + resize per item — the host work the eval loop
pays per image). PIL decode/resize release the GIL, so threads scale with
CORES when per-item Python overhead is small; `loader=processes`
(fork pool + shared-memory image blocks, eval.loader) is the fallback
when host transforms hold the GIL. On this 1-vCPU dev box both pooled
paths mostly demonstrate overlap-not-slowdown, and per-core numbers
extrapolate to real eval hosts (the reference uses a num_workers torch
DataLoader for the same reason, train_distr.py:213-222).

Usage: python scripts/bench_eval_loader.py [n=256] [workers=0,4,8]
                                           [loaders=threads,processes]
Prints one JSON line per (loader, worker count); workers=0 rows are the
sequential baseline and run once.
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _DiskImageDataset:
    """Minimal dataset: decode JPEG + resize, like eval-mode CocoDataset."""

    def __init__(self, files, hw=(480, 640)):
        self.files = files
        self.hw = hw

    def __len__(self):
        return len(self.files)

    def get(self, i, rng):
        from gpv_tpu.datasets.coco import load_image, resize_uint8
        img = load_image(self.files[i])
        return {"image": resize_uint8(img, *self.hw),
                "query": f"what is {i}?"}


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    n = int(args.get("n", 256))
    workers = [int(w) for w in args.get("workers", "0,4,8").split(",")]

    from PIL import Image
    from gpv_tpu.infer.predictions import iter_padded_batches

    tmp = Path(tempfile.mkdtemp(prefix="eval_loader_bench_"))
    rng = np.random.RandomState(0)
    files = []
    for i in range(min(n, 64)):  # reuse 64 distinct JPEGs round-robin
        p = tmp / f"{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (480, 640, 3),
                                    np.uint8)).save(p, quality=90)
        files.append(str(p))
    ds = _DiskImageDataset([files[i % len(files)] for i in range(n)])

    loaders = args.get("loaders", "threads,processes").split(",")
    for loader in loaders:
        for nw in workers:
            if nw == 0 and loader != loaders[0]:
                continue  # sequential baseline is loader-independent
            # warm pass: fault in files/page cache
            next(iter_padded_batches(ds, 16, max_samples=16,
                                     num_workers=nw, loader=loader))
            # each iter_padded_batches call constructs its OWN pool, so
            # start the clock after the FIRST batch of the measured
            # generator: pool fork/threads + prefetch ramp are excluded
            # (a real eval run pays them once per epoch, not per batch)
            gen = iter_padded_batches(ds, 16, num_workers=nw,
                                      loader=loader)
            next(gen)  # items below EXCLUDES this ramp batch's 16 rows
            t0 = time.perf_counter()
            items = 0
            for batch, n_real in gen:
                items += n_real
            dt = time.perf_counter() - t0
            if items == 0:
                print(json.dumps({"loader": loader, "num_workers": nw,
                                  "error": f"n={n} yields a single batch; "
                                           f"need n > 16 to time past the "
                                           f"ramp batch"}), flush=True)
                continue
            print(json.dumps({"loader": loader if nw else "sequential",
                              "num_workers": nw, "items": items,
                              "img_per_sec": round(items / dt, 1),
                              "ms_per_img": round(1000 * dt / items, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
