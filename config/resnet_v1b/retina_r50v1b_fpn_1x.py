"""retina_r50v1b_fpn_1x (reference config/resnet_v1b/retina_r50v1b_fpn_1x.py)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    return retina_fpn_config(is_train, __name__, depth=50, variant="v1b")
