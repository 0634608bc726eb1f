"""retina_r50v1b_fpn_1x_fitnet_g10 (reference config/kd/retina_r50v1b_fpn_1x_fitnet_g10.py): FitNet hint distillation on RetinaNet,
v1b student, hint-loss grad scale 10."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.KD.builder import FitNetHead, FitNetRetinaNet
    import models.retinanet.builder as retina_builder
    from models.FPN.builder import ResNet50V1bFPN

    cfg = list(retina_fpn_config(is_train, __name__, depth=50, variant="v1b",
                                 schedule_mult=1))
    General, RpnParam, ModelParam = cfg[0], cfg[2], cfg[6]

    class KDParam:
        channel = 1024
        stage = "c4"
        grad_scale = 10.0

    class _B:
        fp16 = General.fp16
        normalizer = None

    if is_train:
        det = FitNetRetinaNet()
        ModelParam.train_symbol = det.get_train_symbol(
            ResNet50V1bFPN(_B),
            retina_builder.RetinaNetNeck(_B),
            retina_builder.RetinaNetHead(RpnParam),
            FitNetHead(KDParam))
        cfg[11] = ["gt_bbox", "im_info", "teacher_label"]

        from simpledet_tpu.dsl import ResNet152V1bFPN

        class teacher_param:
            backbone = ResNet152V1bFPN(_B)
            prefix = "teacher_model/retina_r152v1b_fpn_1x/checkpoint"
            epoch = 6
            endpoint = "c4"

        ModelParam.teacher_param = teacher_param
    return tuple(cfg)
