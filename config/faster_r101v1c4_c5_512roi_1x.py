"""faster_r101v1c4_c5_512roi_1x (reference config/faster_r101v1c4_c5_512roi_1x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=101, resnet_variant="v1", num_branch=1, scaleaware=False, image_roi=512, batch_image=2)
