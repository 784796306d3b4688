from .boxes import (box_area, box_cxcywh_to_xyxy, box_iou, box_xyxy_to_cxcywh,
                    elementwise_generalized_box_iou, generalized_box_iou,
                    masks_to_boxes)
from .image import normalize_image, preprocess, resize_image
from .matcher import detr_cost_matrix, hungarian_match, solve_lsap
from .posenc import sine_position_embedding_2d, sine_position_encoding_1d
from .roi_align import roi_align, roi_align_mean_pooled

__all__ = [
    "box_area", "box_cxcywh_to_xyxy", "box_iou", "box_xyxy_to_cxcywh",
    "elementwise_generalized_box_iou", "generalized_box_iou", "masks_to_boxes",
    "normalize_image", "preprocess", "resize_image",
    "detr_cost_matrix", "hungarian_match", "solve_lsap",
    "sine_position_embedding_2d", "sine_position_encoding_1d",
    "roi_align", "roi_align_mean_pooled",
]
