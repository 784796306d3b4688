from .predictions import (compute_cap_test_predictions,
                          compute_vqa_test_predictions, coco_vocab_mask,
                          evaluate_predictions, make_predictions,
                          update_samples_with_image_size)

__all__ = [
    "compute_cap_test_predictions", "compute_vqa_test_predictions",
    "coco_vocab_mask", "evaluate_predictions", "make_predictions",
    "update_samples_with_image_size",
]
