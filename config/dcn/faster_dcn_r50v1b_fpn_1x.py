"""Faster R-CNN with DCN stage4/5 (reference config/dcn/)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.dcn.builder import DCNResNetFPN

    def backbone(pBackbone):
        pBackbone.num_c4_block = 3
        pBackbone.num_c5_block = 3
        return DCNResNetFPN(pBackbone)

    return faster_fpn_config(is_train, __name__, depth=50, variant="v1b",
                             backbone=backbone)
