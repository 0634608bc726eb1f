"""retina_r50v1b_fpn_pconv_1x (reference config/sepc/retina_r50v1b_fpn_pconv_1x.py)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.sepc.builder import (RetinaNetHeadWithBNWithSEPC,
                                     RetinaNetNeckWithBNWithSEPC)

    class SEPCParam:
        Pconv_num = 4
        pconv_deform = False
        lcconv_deform = False
        ibn = False
        lcconv = False

    return retina_fpn_config(
        is_train, __name__, depth=50, variant="v1b",
        neck=RetinaNetNeckWithBNWithSEPC, neck_args=SEPCParam,
        head=RetinaNetHeadWithBNWithSEPC)
