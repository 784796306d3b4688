from .coco import (DATASET_CLASSES, CocoCapTestOriginalSplit,
                   CocoCaptioning, CocoClassification, CocoDetection,
                   CocoMultitaskDataset, CocoVqa, CocoVqaTestOriginalSplit,
                   GenericCocoDataset, RefCocop)
from .loader import Collator, DataLoader

__all__ = [
    "DATASET_CLASSES", "CocoCapTestOriginalSplit", "CocoCaptioning",
    "CocoClassification", "CocoDetection", "CocoMultitaskDataset", "CocoVqa",
    "CocoVqaTestOriginalSplit", "GenericCocoDataset", "RefCocop",
    "Collator", "DataLoader",
]
