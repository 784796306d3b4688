"""PTB tokenizer rule coverage (VERDICT r2 #10, PARITY.md #6).

pycocoevalcap shells out to Stanford CoreNLP's Java PTBTokenizer (ptb3
escaping) and then strips a punctuation list + lowercases. Our pure-Python
replacement is `gpv_tpu.evaluation.ptb`. The Java side cannot run here, so
this suite encodes the DOCUMENTED PTB3 tokenizer behavior per rule class
(Stanford PTBTokenizer javadoc + the published Treebank sed script) as
expected outputs and measures where we agree/disagree.

Result (recorded in PARITY.md #6): POST-STRIP agreement on every
caption-realistic class — contractions, possessives, currency, percent,
commas (incl. numeric), hyphenated words, slashes, ellipses, brackets
(incl. the pycocoevalcap quirk that lowercased '-lrb-' escapes survive the
UPPERCASE strip list), quotes, multi-sentence periods, abbreviation
periods, question/exclamation marks. Known residual disagreement classes,
asserted below so a silent change is caught:
  1. sentence-final abbreviations ("the U.S." at end: PTB3 duplicates the
     period as a separate '.' token; we don't emit it) — the '.' is in the
     strip list, so post-strip output is identical.
  2. abbreviations OUTSIDE our vendored lexicon subset (full CoreNLP has a
     larger list) — affects only whether a rare mid-caption period splits.
  3. non-ASCII quotes/dashes (PTB3 normalizes to ASCII; we pass through) —
     absent from COCO captions (ASCII json).
"""
import pytest

from gpv_tpu.evaluation.ptb import ptb_tokenize_caption

# (caption, expected post-strip lowercased tokenization under PTB3 rules)
AGREE_CASES = [
    # contractions / possessives (sed script clitic rules)
    ("A dog that doesn't sit", "a dog that does n't sit"),
    ("The man's hat isn't red", "the man 's hat is n't red"),
    ("They're playing frisbee", "they 're playing frisbee"),
    ("I've seen it, you'll like it", "i 've seen it you 'll like it"),
    ("He'd gone; she's here", "he 'd gone she 's here"),
    ("Cannot and gonna and wanna go", "can not and gon na and wan na go"),
    # currency / percent / special chars (split, NOT in the strip list)
    ("It costs $5 now", "it costs $ 5 now"),
    ("Over 50% of the cake", "over 50 % of the cake"),
    ("AT&T sign on a building", "at & t sign on a building"),
    # punctuation that IS stripped
    ("A cat. A dog!", "a cat a dog"),
    ("Is this a pizza?", "is this a pizza"),
    ("red, green, and blue", "red green and blue"),
    ("wait -- a horse", "wait a horse"),
    ("a sign that says stop...", "a sign that says stop"),
    ("one: two; three", "one two three"),
    # numeric commas/colons stay inside the number (sed: only before
    # non-digits), so '1,000' survives as one token
    ("1,000 birds at 5:30", "1,000 birds at 5:30"),
    # hyphenated words stay joined; standalone hyphen stripped
    ("A well-dressed man", "a well-dressed man"),
    ("a built - in oven", "a built in oven"),
    # slashes pass through (PTB3 keeps them in caption-style text)
    ("a black/white photo", "a black/white photo"),
    # brackets: PTB3 escapes them, -lowerCase makes '-lrb-', and the
    # UPPERCASE strip list then never matches — the reference's tokenized
    # captions genuinely contain these tokens (pycocoevalcap quirk)
    ("a dog (small) on a bed", "a dog -lrb- small -rrb- on a bed"),
    ("boxes [two] {three} here",
     "boxes -lsb- two -rsb- -lcb- three -rcb- here"),
    # quotes normalize to ``/'' on both sides, stripped
    ('a sign saying "stop" here', "a sign saying stop here"),
    # multi-sentence captions
    ("A man rides. A horse walks.", "a man rides a horse walks"),
    # mid-sentence abbreviation periods stay attached
    ("mr. jones rides a horse", "mr. jones rides a horse"),
    ("a u.s. flag on a pole", "a u.s. flag on a pole"),
]

# classes where the Java tokenizer is DOCUMENTED to differ from the sed
# rules; asserted so any silent behavior change here is caught. Post-strip,
# these all still agree (the differing token is stripped punctuation).
FINAL_ABBREV_CASES = [
    # PTB3 emits "u.s." + "." (period duplication after final
    # abbreviation); the sed rules leave "u.s." alone. Both reduce to
    # "a flag of the u.s." after the punctuation strip.
    ("A flag of the U.S.", "a flag of the u.s."),
]


class TestPtbRuleCoverage:
    @pytest.mark.parametrize("caption,expected", AGREE_CASES)
    def test_agrees_with_documented_ptb3_output(self, caption, expected):
        assert ptb_tokenize_caption(caption) == expected

    @pytest.mark.parametrize("caption,expected", FINAL_ABBREV_CASES)
    def test_final_abbreviation_agrees_post_strip(self, caption, expected):
        assert ptb_tokenize_caption(caption) == expected

    def test_strip_list_matches_java_wrapper(self):
        """The punctuation strip list is the Java wrapper's PUNCTUATIONS
        verbatim (pycocoevalcap tokenizer/ptbtokenizer.py)."""
        from gpv_tpu.evaluation.ptb import PUNCTUATIONS
        assert PUNCTUATIONS == {"''", "'", "``", "`", "-LRB-", "-RRB-",
                                "-LCB-", "-RCB-", ".", "?", "!", ",", ":",
                                "-", "--", "...", ";"}


class TestAbbrevReachability:
    """PARITY #6 residual shrink (round 5): the abbreviation divergence
    class is only reachable through period-bearing tokens, and in model
    hypotheses those can only come from the answer vocab — so the guard
    enumerates them there, where the real corpus is in hand."""

    def test_month_day_rank_abbrevs_covered(self):
        # the CoreNLP lexicon classes plausibly reachable from captions
        from gpv_tpu.evaluation.ptb import ptb_tokenize_caption
        assert ptb_tokenize_caption("A calendar open to Jan. 5th") == \
            "a calendar open to jan. 5th"
        assert ptb_tokenize_caption("a sign reading Sat. hours only") == \
            "a sign reading sat. hours only"
        assert ptb_tokenize_caption("A photo of Sgt. Smith") == \
            "a photo of sgt. smith"

    def test_is_covered_abbrev(self):
        from gpv_tpu.evaluation.ptb import is_covered_abbrev
        assert is_covered_abbrev("mr.")
        assert is_covered_abbrev("u.s.a.")   # generic dotted class
        assert is_covered_abbrev("Dec.")     # case-insensitive
        assert not is_covered_abbrev("approx.")
        assert not is_covered_abbrev("fig.")

    def test_uncovered_period_tokens(self):
        from gpv_tpu.evaluation.ptb import uncovered_period_tokens
        vocab = ["cat", "mr.", "u.s.", "approx.", "fig.", "3.5", "...",
                 "st.", "jan."]
        # numerals like 3.5 never end in '.' nor carry interior '.' after
        # rstrip — the Treebank tokenizer keeps decimals whole and they
        # are not sentence-boundary candidates
        assert uncovered_period_tokens(vocab) == ["approx.", "fig."]

    def test_vocab_builder_warns_on_uncovered(self, caplog):
        import logging
        from gpv_tpu.data.vocab_builder import build_vocab
        answers = ["approx. two dogs"] * 12
        with caplog.at_level(logging.WARNING):
            vocab, _ = build_vocab(answers)
        assert any("approx." in r.getMessage() for r in caplog.records)
        # a clean corpus stays silent
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            build_vocab(["two dogs"] * 12)
        assert not caplog.records
