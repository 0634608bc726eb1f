"""reppoints_moment_r101v1_fpn_2x (reference config/RepPoints/)."""
from simpledet_tpu.config_templates import reppoints_config


def get_config(is_train):
    return reppoints_config(is_train, __name__, depth=101, schedule_mult=2)
