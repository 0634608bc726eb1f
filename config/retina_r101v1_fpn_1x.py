"""retina_r101v1_fpn_1x (reference config/retina_r101v1_fpn_1x.py)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    return retina_fpn_config(is_train, __name__, depth=101)
