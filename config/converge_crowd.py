"""CrowdHuman double-pred convergence + set-NMS effectiveness config
(tests/test_converge_crowd.py).

Trains the EMD double-prediction R-CNN from scratch on a synthetic
crowd-overlap set (pairs of same-class boxes at IoU ~0.6), then evals the
SAME checkpoint twice: nms.type='setnms' vs 'nms'. Vanilla per-class NMS
suppresses one member of every pair (pair IoU 0.6 > thr 0.5), capping AP;
set-NMS keeps detections sharing a proposal's set id — the measurable
delta that proves the EMD head + set-NMS actually help on crowds
(reference operator_py/nms.py:77-107, models/crowdhuman/builder.py
DoublePredBboxHead). Eval NMS type comes from CONVERGE_CROWD_NMS
(default setnms) so the test can compare both on one checkpoint.
Env prefix: CONVERGE_CROWD_*.
"""
import os

from models.crowdhuman.builder import DoublePredRcnn as Detector
from models.crowdhuman.builder import DoublePredFPNBbox2fcHead as BboxHead
from models.FPN.builder import MSRAResNet50V1FPN
from models.FPN.builder import FPNNeck as Neck
from models.FPN.builder import FPNRpnHead as RpnHead
from models.FPN.builder import FPNRoiAlign as RoiExtractor
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_CROWD"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_crowd", PREFIX)
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
            fg_fraction = 0.5
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            # double-pred pairs each proposal with its 2 best gt
            # (bbox_sec_target analog); class-agnostic like the reference
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 2                      # person vs bg
        image_roi = 32
        batch_image = General.batch_image

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

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
    TestParam = cc.make_test_param("converge_crowd", PREFIX, OptimizeParam,
                                   max_det=20)
    # the gate evals one checkpoint under both NMS modes
    TestParam.nms.type = os.environ.get("CONVERGE_CROWD_NMS", "setnms")
    TestParam.nms.thr = 0.5

    backbone = TinyBackbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    roi_extractor = RoiExtractor(RoiParam)
    bbox_head = BboxHead(BboxParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head)

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
        metric.ScalarLoss("EMD", ["emd_loss"], []),
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
