"""faster_dcn_r50v1bc4_c5_512roi_1x (reference config/dcn/faster_dcn_r50v1bc4_c5_512roi_1x.py): v1b C4 backbone with deformable 3x3 in
the last 3 c4 units, C5-512roi head."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    from models.dcn.builder import DCNResNetC4S16, DCNv2ResNetC4S16

    def backbone(pBackbone):
        pBackbone.num_c4_block = 3
        return DCNResNetC4S16(pBackbone)

    return trident_c4_config(is_train, __name__, depth=50,
                             resnet_variant="v1b", num_branch=1,
                             scaleaware=False, image_roi=512, batch_image=2,
                             schedule_mult=1, backbone=backbone)
