"""End-to-end demo (the notebook-equivalent of the reference's
inference.ipynb / inference_beam_search.ipynb): build an engine, run greedy
and beam inference on an image, and render the predicted boxes.

Usage:
  python examples/demo.py <image.jpg> "what is this?" [ckpt]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else None
    query = sys.argv[2] if len(sys.argv) > 2 else "describe the image"
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None

    import numpy as np
    from gpv_tpu.utils.config import load_config
    from gpv_tpu.utils.visualize import save_vis, vis_sample
    from inference import build_engine
    from inference_util import read_image

    overrides = [] if ckpt is None else [f"ckpt={ckpt}"]
    cfg = load_config("configs", "exp/gpv", overrides)
    engine = build_engine(cfg)

    if image_path is None:  # no image given: run on noise as a smoke test
        img = (np.random.RandomState(0).rand(480, 640, 3) * 255
               ).astype(np.uint8)
    else:
        img = read_image(image_path, resize_image=True)

    print(f"query: {query}")
    out = engine.predict(img[None], [query])[0]
    print(f"greedy answer: {out['answer']!r}")
    print("top boxes (cxcywh, relevance):")
    for b, r in zip(out["boxes"][:5], out["relevance"][:5]):
        print(f"  {np.round(b, 3).tolist()}  {r:.3f}")

    beam = engine.predict_beam(img[None], [query], beam_size=5)[0]
    print("beam answers:")
    for a, p in zip(beam["answers"], beam["answer_probs"]):
        print(f"  {p:.4f}  {a!r}")

    vis = vis_sample(img, out["boxes"], out["relevance"], num_boxes=5,
                     answer=out["answer"])
    save_vis(vis, "/tmp/gpv_demo_vis.jpg")
    print("visualization written to /tmp/gpv_demo_vis.jpg")


if __name__ == "__main__":
    main()
