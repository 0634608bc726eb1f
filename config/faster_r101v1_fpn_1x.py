"""faster_r101v1_fpn_1x — Faster R-CNN, ResNet-101-v1 FPN, 1x, COCO
(reference config/faster_r101v1_fpn_1x.py)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    return faster_fpn_config(is_train, __name__, depth=101)
