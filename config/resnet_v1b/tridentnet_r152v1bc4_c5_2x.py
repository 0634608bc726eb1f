"""tridentnet_r152v1bc4_c5_2x (reference config/resnet_v1b/tridentnet_r152v1bc4_c5_2x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=152, resnet_variant="v1b", schedule_mult=2)
