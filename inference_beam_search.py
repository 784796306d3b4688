"""Single-image beam-search inference CLI (public API surface #2).

Behavior spec: reference `inference_beam_search.py` — same as inference.py
but the image IS resized to the task 480x640 (`inference_util.read_image`
resize path) and decoding uses `forward_beam_search(beam_size)`; prints the
K answers with probabilities plus the top boxes.

Usage:
  python inference_beam_search.py ckpt=<path> image_path=<img> \
      query="what is this?" beam_size=5
"""
import sys


def main(argv=None):
    from gpv_tpu.datasets.coco import load_image, resize_uint8
    from gpv_tpu.utils.config import load_config
    from inference import build_engine

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config("configs", "exp/gpv_inference", overrides)
    engine = build_engine(cfg)

    img = load_image(cfg.image_path)
    img = resize_uint8(img, int(cfg.task_configs.image_size.H),
                       int(cfg.task_configs.image_size.W),
                       method=str(cfg.task_configs.get("host_resize",
                                                       "pil")))
    beam_size = int(cfg.get("beam_size", 5))
    # reference_quirks: print the same strings the reference CLI would
    # (incl. its beam-tail quirk, PARITY.md)
    out = engine.predict_beam(img[None], [cfg.query], beam_size,
                              reference_quirks=True)[0]

    print("answers (with probabilities):")
    for ans, p in zip(out["answers"], out["answer_probs"]):
        print(f"  {p:.4f}  {ans}")
    num_boxes = int(cfg.get("num_output_boxes", 5))
    print("relevant boxes (cx, cy, w, h):")
    for i in range(min(num_boxes, len(out["boxes"]))):
        b = out["boxes"][i]
        print(f"  {b[0]:.4f} {b[1]:.4f} {b[2]:.4f} {b[3]:.4f} "
              f"(relevance {out['relevance'][i]:.4f})")
    return out


if __name__ == "__main__":
    main()
