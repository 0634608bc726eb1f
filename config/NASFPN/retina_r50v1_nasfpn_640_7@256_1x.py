"""RetinaNet + NASFPN (reference config/NASFPN/)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.NASFPN.builder import NASFPNNeck, RetinaNetHeadWithBN

    def neck(pNeck):
        pNeck.dim_reduced = 256
        pNeck.num_stage = 7
        pNeck.S0_kernel = 1
        return NASFPNNeck(pNeck)

    return retina_fpn_config(is_train, __name__, depth=50, neck=neck,
                             head=RetinaNetHeadWithBN)
