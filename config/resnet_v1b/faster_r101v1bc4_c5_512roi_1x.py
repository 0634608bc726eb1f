"""faster_r101v1bc4_c5_512roi_1x (reference config/resnet_v1b/faster_r101v1bc4_c5_512roi_1x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=101, resnet_variant="v1b", num_branch=1, scaleaware=False, image_roi=512, batch_image=2, schedule_mult=1)
