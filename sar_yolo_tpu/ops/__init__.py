from .boxes import (bbox2dist, bbox_iou, box_iou_pairwise, dfl_decode, dist2bbox,
                    make_anchors, xywh2xyxy, xyxy2xywh)
from .nms import non_max_suppression

__all__ = ["bbox2dist", "bbox_iou", "box_iou_pairwise", "dfl_decode", "dist2bbox",
           "make_anchors", "xywh2xyxy", "xyxy2xywh", "non_max_suppression"]
