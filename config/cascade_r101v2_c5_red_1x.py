"""cascade_r101v2_c5_red_1x (reference config/cascade_r101v2_c5_red_1x.py)."""
from simpledet_tpu.config_templates import cascade_c5_red_config


def get_config(is_train):
    return cascade_c5_red_config(is_train, __name__, depth=101)
