"""faster_r101v1_fpn_2x (reference config/faster_r101v1_fpn_2x.py)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    return faster_fpn_config(is_train, __name__, depth=101, schedule_mult=2)
