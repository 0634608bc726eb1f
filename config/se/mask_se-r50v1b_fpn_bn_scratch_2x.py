"""mask_se-r50v1b_fpn_bn_scratch_2x (reference config/se/): SE-ResNet-50-v1b
backbone (SE in every unit) + SE mask head, sync-BN, trained from scratch."""
from simpledet_tpu.config_templates import mask_fpn_config


def get_config(is_train):
    from models.se.builder import MaskRcnnSe4convHead, SEResNetFPN

    def backbone(pBackbone):
        # every unit is an SE unit (reference se_resnet_v1b full backbone)
        pBackbone.num_c2_block = 99
        pBackbone.num_c3_block = 99
        pBackbone.num_c4_block = 99
        pBackbone.num_c5_block = 99
        return SEResNetFPN(pBackbone)

    return mask_fpn_config(is_train, __name__, depth=50, variant="v1b",
                           schedule_mult=2, norm_type="syncbn",
                           from_scratch=True, backbone=backbone,
                           mask_head=MaskRcnnSe4convHead)
