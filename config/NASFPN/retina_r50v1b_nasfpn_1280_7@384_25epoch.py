"""retina_r50v1b_nasfpn_1280_7@384_25epoch (reference config/NASFPN/retina_r50v1b_nasfpn_1280_7@384_25epoch.py): 25-epoch schedule, fixed
1280x1280 inputs."""
from simpledet_tpu.config_templates import (retina_fpn_config,
                                            standard_transforms)


def get_config(is_train):
    from models.NASFPN.builder import (NASFPNNeck, RetinaNetHeadWithBN,
                                       TopDownBottomUpFPNNeck)

    def neck(pNeck):
        pNeck.dim_reduced = 384
        pNeck.num_stage = 7
        pNeck.S0_kernel = 1
        return NASFPNNeck(pNeck)

    cfg = list(retina_fpn_config(is_train, __name__, depth=50, variant="v1b",
                                 neck=neck, head=RetinaNetHeadWithBN))
    OptimizeParam, TestParam = cfg[7], cfg[8]
    OptimizeParam.schedule.end_epoch = 25
    TestParam.model.epoch = 25
    cfg[9], cfg[10], cfg[11] = standard_transforms(is_train, short=1280,
                                                   long=1280)
    return tuple(cfg)
