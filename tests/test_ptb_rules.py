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
