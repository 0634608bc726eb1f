"""faster_r50v1b_fpn_dualheadsmall_1x (reference config/resnet_v1b/):
Double-Head bbox head — fc branch for classification, conv branch for
regression."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.FPN.builder import FPNBboxDualHeadSmall
    return faster_fpn_config(is_train, __name__, depth=50, variant="v1b",
                             bbox_head=FPNBboxDualHeadSmall)
