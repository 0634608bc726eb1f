"""reppoints_minmax_r50v1_fpn_1x (reference config/RepPoints/)."""
from simpledet_tpu.config_templates import reppoints_config


def get_config(is_train):
    return reppoints_config(is_train, __name__, depth=50,
                            point_transform="minmax")
