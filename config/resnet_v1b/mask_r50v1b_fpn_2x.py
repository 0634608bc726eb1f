"""mask_r50v1b_fpn_2x (reference config/resnet_v1b/mask_r50v1b_fpn_2x.py)."""
from simpledet_tpu.config_templates import mask_fpn_config


def get_config(is_train):
    return mask_fpn_config(is_train, __name__, depth=50, variant="v1b",
                           schedule_mult=2)
