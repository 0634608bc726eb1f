"""faster_r101v1b_fpn_2x (reference config/resnet_v1b/faster_r101v1b_fpn_2x.py)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    return faster_fpn_config(is_train, __name__, depth=101, variant="v1b",
                             schedule_mult=2)
