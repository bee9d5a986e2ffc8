"""Device ops: the TPU-native compute kernels of the framework."""

from sgg_tpu.ops.boxes import (  # noqa: F401
    box_area, box_iou, center_to_corner, clip_boxes, scale_boxes_01,
    union_boxes,
)
from sgg_tpu.ops.rects import draw_union_rects  # noqa: F401
from sgg_tpu.ops.roi_align import roi_align  # noqa: F401
