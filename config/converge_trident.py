"""TridentNet convergence-proof config (tests/test_converge_trident.py).

The last north-star family without learning proof (VERDICT r4 Missing #3):
a 3-branch weight-shared dilated trident C4 with scale-aware training
overfits the shared 16-image synthetic set from scratch until train-set
AP >= 0.6 through train -> checkpoint -> detection_test. Exercises the
machinery that can silently mis-train (reference
models/tridentnet/builder.py:538-571, resnet_v2.py:15-97): branch folding
into the batch axis, weight-shared multi-dilation stage-3 units,
scale-aware gt filtering per branch + invalid-gt anchor ignore, and the
cross-branch test-time merge (range-filtered detections folded into the
detection axis before per-class NMS).

Branch valid ranges are tuned to the micro set's geometry: objects are
30-80 px at original scale, x0.8 after the short-128 resize -> sqrt-area
~24-64 px. Ranges (0,40)/(25,56)/(40,-1) make every branch see a proper
subset of the gt (scale filtering actually masks boxes) while the union
covers everything (AP can reach 1). Env prefix: CONVERGE_TRIDENT_*.
"""
from models.tridentnet.builder import TridentFasterRcnn as Detector
from models.tridentnet.builder import TridentMXNetResNetV2 as Backbone
from models.tridentnet.builder import TridentRpnHead as RpnHead
from models.tridentnet.builder import BboxC5Head as BboxHead
from symbol.builder import Neck, RoiAlign as RoiExtractor
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_TRIDENT"


class Trident:
    num_branch = 3
    train_scaleaware = True
    test_scaleaware = True
    valid_ranges = [(0, 40), (25, 56), (40, -1)]


def get_config(is_train):
    General = cc.make_general("converge_trident", PREFIX)
    KvstoreParam = cc.make_kvstore(General)

    class NormalizeParam:
        normalizer = normalizer_factory(type="syncbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        depth = 18
        trident = Trident

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image * Trident.num_branch

        class anchor_generate:
            scale = (1.5, 2.5, 4)      # 24/40/64 px at stride 16
            ratio = (0.5, 1.0, 2.0)
            stride = (16,)
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
        depth = 18
        image_roi = 32
        batch_image = General.batch_image * Trident.num_branch

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = 16

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.005", epochs="120",
                                     warmup="60", lr_iter="320,400")
    TestParam = cc.make_test_param("converge_trident", PREFIX, OptimizeParam)

    backbone = Backbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    roi_extractor = RoiExtractor(RoiParam)
    bbox_head = BboxHead(BboxParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            num_branch=Trident.num_branch,
            scaleaware=Trident.train_scaleaware,
            valid_ranges=Trident.valid_ranges)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            num_branch=Trident.num_branch,
            scaleaware=Trident.test_scaleaware,
            valid_ranges=Trident.valid_ranges)

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
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
