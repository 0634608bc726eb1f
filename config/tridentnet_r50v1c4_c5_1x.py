"""tridentnet_r50v1c4_c5_1x (reference config/tridentnet_r50v1c4_c5_1x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=50, resnet_variant="v1")
