"""Mask Scoring R-CNN convergence-proof config (tests/test_converge_msrcnn.py).

The converge_mask ellipse recipe with the MaskIoU scoring head
(VERDICT r4 Weak #3; reference models/msrcnn/ maskiou target + head):
overfits until segm AP >= 0.6 through train -> checkpoint -> mask_test,
gating the maskiou regression and its score reweighting at test.
Env prefix: CONVERGE_MSRCNN_*.
"""
from models.msrcnn.builder import MaskScoringFasterRcnn as Detector
from models.msrcnn.builder import MaskIoUConvHead
from models.maskrcnn.builder import MSRAResNet50V1FPN
from models.maskrcnn.builder import FPNNeck as Neck
from models.maskrcnn.builder import MaskFPNRpnHead as RpnHead
from models.maskrcnn.builder import FPNRoiAlign as RoiExtractor
from models.maskrcnn.builder import FPNBbox2fcHead as BboxHead
from models.maskrcnn.builder import MaskFasterRcnn4ConvHead as MaskHead
from models.maskrcnn.builder import BboxPostProcessor
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_MSRCNN"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18   # bottleneck-block R18: half the units of R50


def get_config(is_train):
    General = cc.make_general("converge_msrcnn", PREFIX)
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
            num_reg_class = 4
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 4
        image_roi = 32
        batch_image = General.batch_image

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class MaskParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        resolution = 28
        dim_reduced = 64
        num_fg_roi = int(RpnParam.subsample_proposal.image_roi *
                         RpnParam.subsample_proposal.fg_fraction)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class MaskRoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 14
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.005", epochs="120",
                                     warmup="60", lr_iter="320,400")
    TestParam = cc.make_test_param("converge_msrcnn", PREFIX, OptimizeParam)

    backbone = TinyBackbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam, MaskParam)
    roi_extractor = RoiExtractor(RoiParam)
    mask_roi_extractor = RoiExtractor(MaskRoiParam)
    bbox_head = BboxHead(BboxParam)
    mask_head = MaskHead(BboxParam, MaskParam, MaskRoiParam)
    bbox_post_processor = BboxPostProcessor(TestParam)
    maskiou_head = MaskIoUConvHead(TestParam, BboxParam, MaskParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, mask_roi_extractor,
            bbox_head, mask_head, maskiou_head)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, mask_roi_extractor,
            bbox_head, mask_head, maskiou_head, bbox_post_processor)

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

    from core.detection_input import ReadRoiRecord, RenameRecord
    from models.maskrcnn.input import (
        Norm2DImage, PreprocessGtPoly, EncodeGtPoly, Resize2DImageBboxMask,
        Flip2DImageBboxMask, Pad2DImageBboxMask)
    from simpledet_tpu.data.transforms import (Resize2DImageBbox,
                                               Pad2DImageBbox)

    if is_train:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(cc.NormParam),
            PreprocessGtPoly(),
            Resize2DImageBboxMask(cc.ResizeParam),
            Flip2DImageBboxMask(),
            Pad2DImageBboxMask(cc.PadParam),
            EncodeGtPoly(cc.PadParam),
            RenameRecord(cc.RenameParam.mapping),
        ]
        data_name = ["data"]
        label_name = ["gt_bbox", "gt_poly", "im_info"]
    else:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(cc.NormParam),
            Resize2DImageBbox(cc.ResizeParam),
            Pad2DImageBbox(cc.PadParam),
            RenameRecord(cc.RenameParam.mapping),
        ]
        data_name = ["data", "im_info", "im_id", "rec_id"]
        label_name = []

    import core.detection_metric as metric

    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
        metric.ScalarLoss("MaskCE", ["mask_loss"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
