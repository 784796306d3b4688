"""Penn-Treebank-style word tokenizer/detokenizer (pure Python, host-side).

Behavior spec: the reference calls `nltk.word_tokenize` when encoding answers
(`exp/gpv/models/gpv.py:409`) and `TreebankWordDetokenizer` when turning
decoded token ids back into strings (`exp/gpv/metrics.py:52`). The NLTK data
files aren't shippable here, so the framework carries its own implementation
of the classic Treebank rules (punctuation splitting, contractions, quote
directionality). The rule set is the standard published sed-script behavior;
outputs match `nltk.tokenize.word_tokenize` on the vocabulary GPV deals with
(lowercase COCO answers/captions/questions).
"""
from __future__ import annotations

import re

# --- tokenizer rules (applied in order) -------------------------------------
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]
_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]
_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]
_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]
_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]
_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)(?=\s)"),
]


def word_tokenize(text: str) -> list[str]:
    """Treebank word tokenization of one sentence."""
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PARENS_BRACKETS:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _DOUBLE_DASHES:
        text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


# --- detokenizer rules (inverse direction) ----------------------------------
_DETOK_ENDING_QUOTES = [
    (re.compile(r"([^' ])\s('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1\2 "),
    (re.compile(r"([^' ])\s('[sS]|'[mM]|'[dD]|') "), r"\1\2 "),
    (re.compile(r"(\S)\s(\'\')"), r"\1\2"),
    (re.compile(r" ''"), '"'),
]
_DETOK_PUNCT = [
    (re.compile(r"\s(--)\s"), r"\1"),
    (re.compile(r"([\[\(\{\<])\s"), r"\1"),
    (re.compile(r"\s([\]\)\}\>])"), r"\1"),
    (re.compile(r"\s([?!])"), r"\g<1>"),
    (re.compile(r'([^\.])\s(\.)([\]\)}>"\']*)\s*$'), r"\1\2\3"),
    (re.compile(r"([#$])\s"), r"\g<1>"),
    (re.compile(r"\s([;%:,])"), r"\1"),
]
_DETOK_STARTING_QUOTES = [
    (re.compile(r"([ (\[{<])\s``"), r'\1"'),
    (re.compile(r"(``)\s"), r"\1"),
    (re.compile(r"``"), r'"'),
]


def detokenize(tokens: list[str]) -> str:
    """Inverse of `word_tokenize`, Treebank-detokenizer style."""
    text = " ".join(tokens)
    for regexp in _CONTRACTIONS:
        text = regexp.sub(r"\1\2", text)
    for regexp, substitution in _DETOK_ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    text = text.strip()
    for regexp, substitution in _DETOK_PUNCT:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _DETOK_STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    return text.strip()
