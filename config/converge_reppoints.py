"""RepPoints convergence-proof config (tests/test_converge_reppoints.py).

Overfits the shared 16-image synthetic set from scratch until train-set
box AP >= 0.6 through train -> checkpoint -> detection_test — learning
proof for the point-set family (VERDICT r4 Weak #3; reference
models/RepPoints/point_ops.py init/refine point targets + points2bbox,
config/RepPoints/reppoints_moment_r50v1_fpn_1x.py). Gates the two-stage
point assignment (center assign for init, IoU assign for refine), the
moment transform and the deformable refine offsets end-to-end.
Env prefix: CONVERGE_REPPOINTS_*.
"""
from models.RepPoints.builder import (RepPointsDetector, RepPointsHead,
                                      FCOSFPNNeck)
from models.FPN.builder import MSRAResNet50V1FPN
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_REPPOINTS"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_reppoints", PREFIX)
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
        num_class = 1 + 3
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class point_generate:
            num_points = 9
            scale = 4
            stride = (8, 16, 32, 64, 128)
            transform = "moment"

        class head:
            conv_channel = 64
            point_conv_channel = 64

        class proposal:
            pre_nms_top_n = 100
            min_det_score = 0.02

        class point_target:
            target_scale = 4
            num_pos = 1

        class bbox_target:
            pos_iou_thr = 0.5
            neg_iou_thr = 0.4
            min_pos_iou = 0.0

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    class BboxParam:
        pass

    class RoiParam:
        pass

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.0005", epochs="160",
                                     warmup="60", lr_iter="480,560",
                                     wd=0.00001, opt_type="adam")
    TestParam = cc.make_test_param("converge_reppoints", PREFIX,
                                   OptimizeParam, min_det_score=0.05)

    backbone = TinyBackbone(BackboneParam)
    neck = FCOSFPNNeck(NeckParam)
    head = RepPointsHead(RpnParam)
    detector = RepPointsDetector()
    if is_train:
        train_sym = detector.get_train_symbol(backbone, neck, head)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(backbone, neck, head)

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
        metric.ScalarLoss("ClsL", ["reppoints_cls_loss"], []),
        metric.ScalarLoss("InitL", ["reppoints_init_loss"], []),
        metric.ScalarLoss("RefineL", ["reppoints_refine_loss"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
