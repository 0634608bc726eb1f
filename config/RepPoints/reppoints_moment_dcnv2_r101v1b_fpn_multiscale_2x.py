"""reppoints_moment_dcnv2_r101v1b_fpn_multiscale_2x (reference
config/RepPoints/): modulated DCN (v2) in the last 3 units of c3-c5."""
from simpledet_tpu.config_templates import reppoints_config


def get_config(is_train):
    from models.dcn.builder import DCNv2ResNetFPN

    def backbone(pBackbone):
        pBackbone.num_c3_block = 3
        pBackbone.num_c4_block = 3
        pBackbone.num_c5_block = 3
        return DCNv2ResNetFPN(pBackbone)

    return reppoints_config(is_train, __name__, depth=101, variant="v1b",
                            schedule_mult=2, backbone=backbone,
                            multiscale=True)
