"""PTB caption tokenization (replacing pycocoevalcap's Java PTBTokenizer).

Behavior spec: pycocoevalcap `tokenizer/ptbtokenizer.py` shells out to
stanford-corenlp's PTBTokenizer then strips a fixed punctuation list and
lowercases. Here the framework's own Treebank tokenizer
(`gpv_tpu.text.treebank`) provides the PTB rules; the punctuation strip list
matches the Java wrapper's PUNCTUATIONS exactly.
"""
from __future__ import annotations

from ..text.treebank import word_tokenize

PUNCTUATIONS = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"}


def ptb_tokenize_caption(caption: str) -> str:
    """One caption -> space-joined lowercased tokens minus punctuation."""
    toks = [t.lower() for t in word_tokenize(caption.replace("\n", " "))]
    return " ".join(t for t in toks if t not in PUNCTUATIONS)


def ptb_tokenize(captions_for_image: dict) -> dict:
    """{key: [{'caption': str}, ...]} -> {key: [tokenized_str, ...]}
    (same contract as pycocoevalcap PTBTokenizer.tokenize)."""
    return {k: [ptb_tokenize_caption(c["caption"]) for c in v]
            for k, v in captions_for_image.items()}
