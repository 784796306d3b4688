from .preprocess import (CAPTION_TEMPLATES, CLASSIFICATION_TEMPLATES,
                         DETECTION_TEMPLATES, dump_samples,
                         preprocess_captions, preprocess_classification,
                         preprocess_detection, preprocess_vqa)
from .splits import (AssignCocoCategories, lemmatize, split_categories,
                     split_data_by_categories, split_images)
from .vocab_builder import build_vocab, iter_dataset_answers, write_vocab
from .vocab_embed import embed_vocab, write_vocab_embed

__all__ = [
    "CAPTION_TEMPLATES", "CLASSIFICATION_TEMPLATES", "DETECTION_TEMPLATES",
    "dump_samples", "preprocess_captions", "preprocess_classification",
    "preprocess_detection", "preprocess_vqa",
    "AssignCocoCategories", "lemmatize", "split_categories",
    "split_data_by_categories", "split_images",
    "build_vocab", "iter_dataset_answers", "write_vocab",
    "embed_vocab", "write_vocab_embed",
]
