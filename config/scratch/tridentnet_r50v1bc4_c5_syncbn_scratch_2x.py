"""tridentnet_r50v1bc4_c5_syncbn_scratch_2x (reference config/scratch/tridentnet_r50v1bc4_c5_syncbn_scratch_2x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=50, resnet_variant="v1b", schedule_mult=2, syncbn=True, from_scratch=True)
