"""faster_r50v2c4_c5_256roi_multiscale_2x (reference config/faster_r50v2c4_c5_256roi_multiscale_2x.py): generated from the shared
trident/C4 template — see simpledet_tpu/config_templates.py."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    return trident_c4_config(is_train, __name__, depth=50, resnet_variant="v2", num_branch=1, scaleaware=False, image_roi=256, schedule_mult=2, multiscale=True)
