"""Single-image greedy inference CLI (public API surface #1).

Behavior spec: reference `inference.py` — load checkpoint (torch .pth with
DDP prefix strip, or native orbax), preprocess at NATIVE resolution (no
resize, :69), greedy-decode the answer, print it plus the top
`num_output_boxes` relevance-sorted normalized cxcywh boxes.

Usage:
  python inference.py ckpt=<path> image_path=<img> query="what is this?" \
      [num_output_boxes=5] [model.vocab=<vocab.json>]
"""
import sys


from gpv_tpu.infer.build import build_engine  # noqa: F401 — public re-export


def main(argv=None):
    from gpv_tpu.datasets.coco import load_image
    from gpv_tpu.utils.config import load_config

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv_inference", overrides)
    engine = build_engine(cfg)

    img = load_image(cfg.image_path)  # native H x W (no resize)
    out = engine.predict(img[None], [cfg.query])[0]

    num_boxes = int(cfg.get("num_output_boxes", 5))
    print("answer:", out["answer"])
    print("relevant boxes (cx, cy, w, h):")
    for i in range(min(num_boxes, len(out["boxes"]))):
        b = out["boxes"][i]
        print(f"  {b[0]:.4f} {b[1]:.4f} {b[2]:.4f} {b[3]:.4f} "
              f"(relevance {out['relevance'][i]:.4f})")
    return out


if __name__ == "__main__":
    main()
