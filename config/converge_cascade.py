"""Cascade R-CNN convergence-proof config (tests/test_convergence_families.py).

Overfits the shared 16-image synthetic set from scratch until train-set
box AP >= 0.6 through train -> checkpoint -> detection_test: the in-env
proxy for the reference's MODEL_ZOO Cascade row
(/root/reference/MODEL_ZOO.md — 40.3). Gates the stage-2/3 resampling on
decoded stage-1/2 boxes (fg thr ladder 0.5/0.6/0.7, tightening stds,
1.0/0.5/0.25 loss weights) and the 3-stage test-time score averaging —
wiring a finite-loss e2e cannot validate. Env prefix: CONVERGE_CASCADE_*.
"""
from models.cascade_rcnn.builder import CascadeRcnn as Detector
from models.cascade_rcnn.builder import MSRAResNet50V1FPN
from models.cascade_rcnn.builder import FPNNeck as Neck
from models.cascade_rcnn.builder import FPNRpnHead as RpnHead
from models.cascade_rcnn.builder import FPNRoiAlign as RoiExtractor
from models.cascade_rcnn.builder import CascadeBbox2fcHead as BboxHead
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_CASCADE"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_cascade", PREFIX)
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
        nnvm_proposal = True
        nnvm_rpn_target = True

        class anchor_generate:
            scale = (8,)
            ratio = (0.5, 1.0, 2.0)
            stride = (4, 8, 16, 32, 64)
            image_anchor = 64
            max_side = 256

        class anchor_assign:
            allowed_border = 0
            pos_thr = 0.7
            neg_thr = 0.3
            min_pos_thr = 0.0
            image_anchor = 64
            pos_fraction = 0.5

        class head:
            conv_channel = 64
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_top_n = 128
            post_nms_top_n = 64
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 32
            fg_fraction = 0.25
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 4
        image_roi = 32
        batch_image = General.batch_image
        stage = "1st"
        loss_weight = 1.0

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 32
            fg_fraction = 0.25
            fg_thr = 0.6
            bg_thr_hi = 0.6
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.05, 0.05, 0.1, 0.1)

    class BboxParam2nd:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 4
        image_roi = 32
        batch_image = General.batch_image
        stage = "2nd"
        loss_weight = 0.5

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.05, 0.05, 0.1, 0.1)

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 32
            fg_fraction = 0.25
            fg_thr = 0.7
            bg_thr_hi = 0.7
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.033, 0.033, 0.067, 0.067)

    class BboxParam3rd:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 4
        image_roi = 32
        batch_image = General.batch_image
        stage = "3rd"
        loss_weight = 0.25

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.033, 0.033, 0.067, 0.067)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.005", epochs="120",
                                     warmup="60", lr_iter="320,400")
    TestParam = cc.make_test_param("converge_cascade", PREFIX, OptimizeParam)

    backbone = TinyBackbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    roi_extractor = RoiExtractor(RoiParam)
    bbox_head = BboxHead(BboxParam)
    bbox_head_2nd = BboxHead(BboxParam2nd)
    bbox_head_3rd = BboxHead(BboxParam3rd)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            bbox_head_2nd, bbox_head_3rd)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            bbox_head_2nd, bbox_head_3rd)

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
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore(
            "RcnnAcc1st", ["bbox_cls_logit_1st", "bbox_label_1st"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
