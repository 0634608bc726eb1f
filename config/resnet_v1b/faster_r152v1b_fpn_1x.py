"""faster_r152v1b_fpn_1x (reference config/resnet_v1b/faster_r152v1b_fpn_1x.py)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    return faster_fpn_config(is_train, __name__, depth=152, variant="v1b",
                             schedule_mult=1)
