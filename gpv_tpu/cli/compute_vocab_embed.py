"""Vocab-embedding CLI: `python -m gpv_tpu.cli.compute_vocab_embed
vocab=<vocab.json> out=<vocab_embed.npy> [bert_vocab=<vocab.txt>]
[bert_ckpt=<hf_torch.bin>]`.

Behavior spec: reference `exp/gpv/compute_vocab_bert.py` — BERT CLS
embedding per vocab word -> (V, 768) .npy consumed by the answer head.
"""
import json
import sys
from pathlib import Path


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    from gpv_tpu.data.vocab_embed import embed_vocab, write_vocab_embed
    from gpv_tpu.text.wordpiece import WordPieceTokenizer

    vocab = json.loads(Path(args["vocab"]).read_text())
    tokenizer = (WordPieceTokenizer.load(args["bert_vocab"])
                 if args.get("bert_vocab") else WordPieceTokenizer.debug())

    bert_params = None
    bert_kwargs = {}
    if args.get("bert_ckpt"):
        from gpv_tpu.train.checkpoint import (convert_bert_torch,
                                              load_torch_state_dict)
        sd = load_torch_state_dict(args["bert_ckpt"])
        prefix = "bert.model." if any(
            k.startswith("bert.model.") for k in sd) else ""
        bert_params = convert_bert_torch(sd, prefix=prefix)

    embed = embed_vocab(vocab, tokenizer, bert_params,
                        bert_kwargs=bert_kwargs)
    out = write_vocab_embed(embed, args.get("out", "vocab_embed.npy"))
    print(f"wrote {out} shape={embed.shape}")


if __name__ == "__main__":
    main()
