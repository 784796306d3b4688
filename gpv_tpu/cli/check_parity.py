"""Checkpoint parity checker: load a reference torch checkpoint, run an
image+query through the converted flax model, and print (or compare) the
outputs.

This is the tool for validating bit-comparable behavior against the
released GPV checkpoints (SURVEY.md §4 golden-output plan):

  # print outputs for an image/query (and save them as goldens)
  python -m gpv_tpu.cli.check_parity ckpt=model.pth image=img.jpg \
      query="what is this?" save=goldens.json

  # compare against saved goldens (e.g. produced by the reference repo)
  python -m gpv_tpu.cli.check_parity ckpt=model.pth image=img.jpg \
      query="what is this?" expect=goldens.json [atol=1e-3]

The goldens JSON format: {"boxes": [[cx,cy,w,h]...], "relevance": [...],
"answer": "..."} — the reference's inference.py output contract.
"""
import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    import jax.numpy as jnp

    from gpv_tpu.datasets.coco import load_image, resize_uint8
    from gpv_tpu.engine import GPVEngine
    from gpv_tpu.text.vocab import AnswerVocab
    from gpv_tpu.text.wordpiece import WordPieceTokenizer
    from gpv_tpu.train.checkpoint import (convert_gpv_torch,
                                          load_torch_state_dict)
    from gpv_tpu.utils.config import load_config

    cfg = load_config("configs", "exp/gpv",
                      [o for o in (argv or sys.argv[1:])
                       if o.split("=", 1)[0] not in
                       ("ckpt", "image", "query", "save", "expect", "atol",
                        "resize")])

    sd = load_torch_state_dict(args["ckpt"])
    vocab_size = sd["answer_head.vocab_embed"].shape[0]
    bert_cfg = cfg.model.get("bert") or {}
    converted = convert_gpv_torch(
        sd,
        num_co_att=int(cfg.model.co_att.num_layers),
        text_dec_layers=int(cfg.model.text_decoder.num_layers),
        hidden=int(cfg.model.hidden_dim),
        detr_layers=tuple(cfg.model.detr.get("backbone_layers",
                                             (3, 4, 6, 3))),
        detr_dim=int(cfg.model.detr.hidden_dim),
        detr_enc=int(cfg.model.detr.num_encoder_layers),
        detr_dec=int(cfg.model.detr.num_decoder_layers),
        bert_layers=int(bert_cfg.get("num_layers", 12)))

    vocab = (AnswerVocab.load(cfg.model.vocab) if cfg.model.vocab
             else AnswerVocab.debug(size=vocab_size))
    tokenizer = (WordPieceTokenizer.load(cfg.model.bert_vocab)
                 if cfg.model.get("bert_vocab")
                 else WordPieceTokenizer.debug())
    engine = GPVEngine.from_config(cfg.model, vocab, tokenizer,
                                   dtype=jnp.float32)
    engine.variables = converted

    img = load_image(args["image"])
    if args.get("resize", "false").lower() == "true":
        # skimage-0.17.2-exact by default: this CLI exists to reproduce the
        # reference's released-checkpoint numbers, where the eval pixel
        # path (coco_generic_dataset.py:61) gates every downstream output
        img = resize_uint8(img, int(cfg.task_configs.image_size.H),
                           int(cfg.task_configs.image_size.W),
                           method=args.get("resize_method", "exact"))
    out = engine.predict(img[None], [args["query"]])[0]
    result = {"answer": out["answer"],
              "boxes": np.asarray(out["boxes"]).tolist(),
              "relevance": np.asarray(out["relevance"]).tolist()}

    if args.get("save"):
        Path(args["save"]).write_text(json.dumps(result))
        print(f"saved goldens to {args['save']}")
    if args.get("expect"):
        atol = float(args.get("atol", 1e-3))
        want = json.loads(Path(args["expect"]).read_text())
        ok = True
        if want.get("answer") != result["answer"]:
            print(f"ANSWER MISMATCH: {result['answer']!r} != "
                  f"{want['answer']!r}")
            ok = False
        for key in ("boxes", "relevance"):
            if key in want:
                diff = np.max(np.abs(np.asarray(want[key])
                                     - np.asarray(result[key])))
                print(f"{key}: max abs diff {diff:.2e}")
                ok &= diff <= atol
        print("PARITY OK" if ok else "PARITY FAILED")
        return 0 if ok else 1
    print(json.dumps({"answer": result["answer"],
                      "top_boxes": result["boxes"][:5],
                      "top_relevance": result["relevance"][:5]}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
