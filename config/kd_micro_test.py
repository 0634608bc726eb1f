"""Micro KD config for CPU e2e tests: FitNet student distilling c4
features from the micro_test experiment's checkpoint (the teacher), via
the teacher_label input produced by the train CLI's frozen-teacher forward
(reference detection_train.py:172-184)."""
import config.micro_test as base


def get_config(is_train):
    cfg = list(base.get_config(is_train))
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam) = cfg[:9]

    class KDGeneral(General):
        name = "kd_micro_test"
    cfg[0] = KDGeneral

    class KDTestModel(TestParam.model):
        prefix = "experiments/kd_micro_test/checkpoint"

    class KDTestParam(TestParam):
        model = KDTestModel
    cfg[8] = KDTestParam

    if is_train:
        from models.KD.builder import FitNetFasterRcnn, FitNetHead
        from models.FPN.builder import (MSRAResNet50V1FPN, FPNNeck,
                                        FPNRpnHead, FPNRoiAlign,
                                        FPNBbox2fcHead)

        class KDParam:
            channel = 1024  # teacher c4 channels (R50)
            stage = "c4"
            grad_scale = 1.0

        class _B:
            fp16 = General.fp16
            normalizer = None

        det = FitNetFasterRcnn()
        ModelParam.train_symbol = det.get_train_symbol(
            MSRAResNet50V1FPN(_B), FPNNeck(_B), FPNRpnHead(RpnParam),
            FPNRoiAlign(RoiParam), FPNBbox2fcHead(BboxParam),
            FitNetHead(KDParam))
        cfg[11] = list(cfg[11]) + ["teacher_label"]

        class teacher_param:
            backbone = MSRAResNet50V1FPN(_B)
            prefix = "experiments/micro_test/checkpoint"
            epoch = 1
            endpoint = "c4"

        ModelParam.teacher_param = teacher_param
    return tuple(cfg)
