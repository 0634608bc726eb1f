"""FCOS convergence-proof config (tests/test_convergence_families.py).

Overfits the shared 16-image synthetic set from scratch until train-set
box AP >= 0.6 through train -> checkpoint -> detection_test: the in-env
proxy for a MODEL_ZOO-style regression for the anchor-free family
(reference config/fcos_r50v1_fpn_1x.py). Gates the on-device location
target assignment (center-sampling-free FCOS ranges), centerness/IoU-loss
wiring and the single-stage test decode. Env prefix: CONVERGE_FCOS_*.
"""
from symbol.builder import RPN as Detector
from models.FCOS.builder import MSRAResNet50V1FPN
from models.FCOS.builder import FCOSFPNNeck as Neck
from models.FCOS.builder import FCOSFPNHead as RpnHead
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_FCOS"
INF = 1e10


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_fcos", PREFIX)
    KvstoreParam = cc.make_kvstore(General)

    class NormalizeParam:
        normalizer = normalizer_factory(type="syncbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class head:
            conv_channel = 64
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_thresh = 0.05
            pre_nms_top_n = 100
            post_nms_top_n = 100
            fpn_box_max_n = 20
            nms_thr = 0.6
            min_bbox_side = 0

        class loss_setting:
            focal_loss_alpha = 0.25
            focal_loss_gamma = 2.0
            ignore_label = -1
            ignore_offset = -1

        class FCOSParam:
            num_classifier = 3
            stride = (8, 16, 32, 64, 128)

    class BboxParam:
        pass

    class RoiParam:
        pass

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.005", epochs="120",
                                     warmup="60", lr_iter="320,400")
    TestParam = cc.make_test_param("converge_fcos", PREFIX, OptimizeParam,
                                   nms_thr=0.6)

    backbone = TinyBackbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(backbone, neck, rpn_head)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(backbone, neck, rpn_head)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = None
        from_scratch = True
        random = False

        class pretrain:
            prefix = "nonexistent"
            epoch = 0
            fixed_param = []

    transform, data_name, label_name = cc.make_transforms(is_train)

    import core.detection_metric as metric
    metric_list = [
        metric.ScalarLoss("CenternessL", ["fcos_centerness_loss"], []),
        metric.ScalarLoss("ClsL", ["fcos_cls_loss"], []),
        metric.ScalarLoss("OffsetL", ["fcos_offset_loss"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
