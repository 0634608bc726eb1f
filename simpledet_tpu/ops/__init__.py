from simpledet_tpu.ops.bbox import (
    BBOX_XFORM_CLIP,
    bbox_overlaps,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    flip_boxes,
    xyxy_to_xywh,
    xywh_to_xyxy,
)
from simpledet_tpu.ops.anchors import (
    generate_base_anchors,
    generate_anchor_grid,
)
