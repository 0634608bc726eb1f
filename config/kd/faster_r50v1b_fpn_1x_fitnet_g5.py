"""faster_r50v1b_fpn_1x_fitnet_g5 (reference config/kd/faster_r50v1b_fpn_1x_fitnet_g5.py): FitNet hint distillation, v1b student,
hint-loss grad scale 5; frozen R152v1b teacher c4 features arrive as the
teacher_label batch input."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.KD.builder import FitNetFasterRcnn, FitNetHead
    from models.FPN.builder import (ResNet50V1bFPN, FPNNeck, FPNRpnHead,
                                    FPNRoiAlign, FPNBbox2fcHead)

    cfg = list(faster_fpn_config(is_train, __name__, depth=50, variant="v1b",
                                 schedule_mult=1))
    General, RpnParam, BboxParam, ModelParam = cfg[0], cfg[2], cfg[4], cfg[6]

    class KDParam:
        channel = 1024
        stage = "c4"
        grad_scale = 5.0

    class _B:
        fp16 = General.fp16
        normalizer = None

    class RoiParam:
        fp16 = General.fp16
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    if is_train:
        det = FitNetFasterRcnn()
        ModelParam.train_symbol = det.get_train_symbol(
            ResNet50V1bFPN(_B), FPNNeck(_B), FPNRpnHead(RpnParam),
            FPNRoiAlign(RoiParam), FPNBbox2fcHead(BboxParam),
            FitNetHead(KDParam))
        cfg[11] = ["gt_bbox", "im_info", "teacher_label"]

        from simpledet_tpu.dsl import ResNet152V1bFPN

        class teacher_param:
            backbone = ResNet152V1bFPN(_B)
            prefix = "teacher_model/faster_r152v1b_fpn_2x/checkpoint"
            epoch = 12
            endpoint = "c4"

        ModelParam.teacher_param = teacher_param
    return tuple(cfg)
