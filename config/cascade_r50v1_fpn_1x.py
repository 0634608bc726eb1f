"""cascade_r50v1_fpn_1x — Cascade R-CNN, ResNet-50-v1 FPN, 1x, COCO.

Schema-compatible with the reference config/cascade_r50v1_fpn_1x.py: three
stage BboxParams with the 0.5/0.6/0.7 IoU ladder, tightening target stds and
1.0/0.5/0.25 loss weights; class-agnostic regression throughout.
"""
from models.cascade_rcnn.builder import CascadeRcnn as Detector
from models.cascade_rcnn.builder import MSRAResNet50V1FPN as Backbone
from models.cascade_rcnn.builder import FPNNeck as Neck
from models.cascade_rcnn.builder import FPNRpnHead as RpnHead
from models.cascade_rcnn.builder import FPNRoiAlign as RoiExtractor
from models.cascade_rcnn.builder import CascadeBbox2fcHead as BboxHead
from mxnext.complicate import normalizer_factory


def get_config(is_train):
    class General:
        log_frequency = 10
        name = __name__.rsplit("/")[-1].rsplit(".")[-1]
        batch_image = 2 if is_train else 1
        fp16 = False
        loader_worker = 8

    class KvstoreParam:
        kvstore = "mesh"
        batch_image = General.batch_image
        gpus = list(range(8))
        fp16 = General.fp16

    class NormalizeParam:
        normalizer = normalizer_factory(type="fixbn")

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
            image_anchor = 256
            max_side = 1400

        class anchor_assign:
            allowed_border = 0
            pos_thr = 0.7
            neg_thr = 0.3
            min_pos_thr = 0.0
            image_anchor = 256
            pos_fraction = 0.5

        class head:
            conv_channel = 256
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_top_n = 2000 if is_train else 1000
            post_nms_top_n = 2000 if is_train else 1000
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 512
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
        num_class = 1 + 80
        image_roi = 512
        batch_image = General.batch_image
        stage = "1st"
        loss_weight = 1.0

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 512
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
        num_class = 1 + 80
        image_roi = 512
        batch_image = General.batch_image
        stage = "2nd"
        loss_weight = 0.5

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.05, 0.05, 0.1, 0.1)

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 512
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
        num_class = 1 + 80
        image_roi = 512
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

    class DatasetParam:
        if is_train:
            image_set = ("coco_train2017",)
        else:
            image_set = ("coco_val2017",)

    backbone = Backbone(BackboneParam)
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

        from_scratch = False
        random = True
        memonger = False
        memonger_until = "stage3"

        class pretrain:
            prefix = "pretrain_model/resnet-v1-50"
            epoch = 0
            fixed_param = ["conv0", "stage1", "scale", "bias"]

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            lr = 0.01 / 8 * len(KvstoreParam.gpus) * KvstoreParam.batch_image
            momentum = 0.9
            wd = 0.0001
            clip_gradient = None

        class schedule:
            begin_epoch = 0
            end_epoch = 6
            lr_iter = [
                60000 * 16 // (len(KvstoreParam.gpus) * KvstoreParam.batch_image),
                80000 * 16 // (len(KvstoreParam.gpus) * KvstoreParam.batch_image)]
            iter_per_epoch = 90000 * 16 // (
                len(KvstoreParam.gpus) * KvstoreParam.batch_image) // 6

        class warmup:
            type = "gradual"
            lr = 0.01 / 8 * len(KvstoreParam.gpus) * KvstoreParam.batch_image / 3.0
            iter = 500

    class TestParam:
        min_det_score = 0.05
        max_det_per_image = 100

        process_roidb = lambda x: x          # noqa: E731
        process_output = lambda x, y: x      # noqa: E731

        class model:
            prefix = "experiments/{}/checkpoint".format(General.name)
            epoch = OptimizeParam.schedule.end_epoch

        class nms:
            type = "nms"
            thr = 0.5

        class coco:
            annotation = "data/coco/annotations/instances_val2017.json"

    # data pipeline
    class NormParam:
        mean = (122.7717, 115.9465, 102.9801)  # RGB
        std = (1.0, 1.0, 1.0)

    class ResizeParam:
        short = 800
        long = 1333

    class PadParam:
        short = 800
        long = 1333
        max_num_gt = 100

    class RenameParam:
        mapping = dict(image="data")

    from core.detection_input import (
        ReadRoiRecord, Norm2DImage, Resize2DImageBbox, Flip2DImageBbox,
        Pad2DImageBbox, ConvertImageFromHwcToChw, RenameRecord)

    if is_train:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam),
            Flip2DImageBbox(),
            Pad2DImageBbox(PadParam),
            ConvertImageFromHwcToChw(),
            RenameRecord(RenameParam.mapping),
        ]
        data_name = ["data"]
        label_name = ["gt_bbox", "im_info"]
    else:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam),
            Pad2DImageBbox(PadParam),
            ConvertImageFromHwcToChw(),
            RenameRecord(RenameParam.mapping),
        ]
        data_name = ["data", "im_info", "im_id", "rec_id"]
        label_name = []

    import core.detection_metric as metric

    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc1st",
                             ["bbox_cls_logit_1st", "bbox_label_1st"], []),
        metric.AccWithIgnore("RcnnAcc3rd",
                             ["bbox_cls_logit_3rd", "bbox_label_3rd"], []),
    ]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
