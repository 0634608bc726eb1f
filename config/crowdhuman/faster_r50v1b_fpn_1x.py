"""faster_r50v1b_fpn_1x (reference config/crowdhuman/): plain Faster R-CNN
on CrowdHuman with ignore-region-aware RPN (full-body boxes, class -2
ignore regions)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from simpledet_tpu.dsl import FPNRpnHeadwithIgnore
    cfg = list(faster_fpn_config(
        is_train, __name__, depth=50, variant="v1b", num_class=2,
        rpn_head=FPNRpnHeadwithIgnore))
    RpnParam, DatasetParam = cfg[2], cfg[5]
    RpnParam.bbox_target.num_reg_class = 2
    DatasetParam.image_set = ("crowdhuman_train",) if is_train \
        else ("crowdhuman_val",)
    return tuple(cfg)
