"""COCO class synonym database.

Behavior spec: reference `data/coco/synonyms.py` ships a hand-curated
80-class synonym table (SYNONYMS) used for classification-eval credit and
SCE category assignment, plus a generator (`data/coco/coco_synonyms.py`)
that seeds candidates from WordNet + dictionary lookups before curation.

The curated table lives as data in `gpv_tpu/evaluation/coco_synonyms.json`
(same content, attributed). `generate_candidate_synonyms` reproduces the
WordNet seeding step when the nltk wordnet corpus is installed; the curated
table remains the source of truth for eval parity.
"""
from __future__ import annotations

from typing import Dict, List

from ..evaluation.evaluators import coco_synonyms

# resolved lazily via module __getattr__ (PEP 562 only fires for MISSING
# attributes — an eager `SYNONYMS = None` here would shadow it and make
# `from gpv_tpu.data.synonyms import SYNONYMS` permanently None)
SYNONYMS: Dict[str, List[str]]


def __getattr__(name):
    if name == "SYNONYMS":
        return coco_synonyms()
    raise AttributeError(name)


def generate_candidate_synonyms(class_names: List[str],
                                max_per_class: int = 10
                                ) -> Dict[str, List[str]]:
    """WordNet-seeded candidate synonyms (the pre-curation step).

    Requires the nltk 'wordnet' corpus; raises LookupError otherwise (the
    corpus is not shipped in every environment — the curated table in
    evaluation/ is what production paths read).
    """
    from nltk.corpus import wordnet  # may raise LookupError without data

    out: Dict[str, List[str]] = {}
    for name in class_names:
        cands = {name}
        for syn in wordnet.synsets(name.replace(" ", "_"), pos="n"):
            for lemma in syn.lemmas():
                cands.add(lemma.name().replace("_", " ").lower())
        out[name] = sorted(cands)[:max_per_class]
    return out
