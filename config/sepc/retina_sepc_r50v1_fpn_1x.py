"""retina with SEPC neck/head (reference config/sepc/)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.sepc.builder import (RetinaNetHeadWithBNWithSEPC,
                                     RetinaNetNeckWithBNWithSEPC)

    class SEPCParam:
        Pconv_num = 4
        pconv_deform = False
        lcconv_deform = False
        ibn = True

    return retina_fpn_config(
        is_train, __name__, depth=50, neck=RetinaNetNeckWithBNWithSEPC,
        neck_args=SEPCParam, head=RetinaNetHeadWithBNWithSEPC)
