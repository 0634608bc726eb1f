"""Micro config for CPU end-to-end tests: tiny images, tiny proposal
counts, 4 classes. Same schema as the real configs."""
import os

from symbol.builder import FasterRcnn as Detector
import os as _os

# SIMPLEDET_MICRO_BACKBONE swaps the backbone variant (v1/v1b/v1d) so the
# resnet_v1b config group's distinctive code paths (3x3-stride bottleneck,
# deep stem, avg-pool shortcut) get a real train-step test via this config
if _os.environ.get("SIMPLEDET_MICRO_BACKBONE", "v1") == "v1":
    from models.FPN.builder import MSRAResNet50V1FPN as Backbone
else:
    from simpledet_tpu.dsl import ResNet50V1bFPN, ResNet50V1dFPN
    Backbone = {"v1b": ResNet50V1bFPN, "v1d": ResNet50V1dFPN}[
        _os.environ["SIMPLEDET_MICRO_BACKBONE"]]
from models.FPN.builder import FPNNeck as Neck
from models.FPN.builder import FPNRpnHead as RpnHead
from models.FPN.builder import FPNRoiAlign as RoiExtractor
from models.FPN.builder import FPNBbox2fcHead as BboxHead
from mxnext.complicate import normalizer_factory

DATA_ROOT = os.environ.get("MICRO_DATA_ROOT", "/tmp/simpledet_micro")


def get_config(is_train):
    class General:
        log_frequency = 2
        name = "micro_test"
        batch_image = 2
        fp16 = False
        loader_worker = 2

    class KvstoreParam:
        kvstore = "mesh"
        batch_image = General.batch_image
        gpus = [0]
        fp16 = General.fp16

    class NormalizeParam:
        # SIMPLEDET_MICRO_NORM lets derived micro configs (syncbn_micro_test)
        # swap the normalizer without duplicating this file
        normalizer = normalizer_factory(
            type=os.environ.get("SIMPLEDET_MICRO_NORM", "fixbn"))

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

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class DatasetParam:
        image_set = ("micro_train",) if is_train else ("micro_val",)
        cache_dir = os.path.join(DATA_ROOT, "cache")

    backbone = Backbone(BackboneParam)
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

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            lr = 0.002
            momentum = 0.9
            wd = 0.0001
            clip_gradient = 35

        class schedule:
            begin_epoch = 0
            end_epoch = 1
            lr_iter = [100]
            iter_per_epoch = 4

        class warmup:
            type = "gradual"
            lr = 0.0005
            iter = 2

    class TestParam:
        min_det_score = 0.01
        max_det_per_image = 20

        process_roidb = lambda x: x          # noqa: E731
        process_output = lambda x, y: x      # noqa: E731

        class model:
            prefix = "experiments/micro_test/checkpoint"
            epoch = 1

        class nms:
            type = "nms"
            thr = 0.5

        class coco:
            annotation = os.path.join(DATA_ROOT, "annotations.json")

    class NormParam:
        mean = (122.7717, 115.9465, 102.9801)
        std = (1.0, 1.0, 1.0)

    class ResizeParam:
        short = 128
        long = 192

    class PadParam:
        short = 128
        long = 192
        max_num_gt = 10

    class RenameParam:
        mapping = dict(image="data")

    from core.detection_input import (
        ReadRoiRecord, Norm2DImage, Resize2DImageBbox, Flip2DImageBbox,
        Pad2DImageBbox, RenameRecord)

    if is_train:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam),
            Flip2DImageBbox(),
            Pad2DImageBbox(PadParam),
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
            RenameRecord(RenameParam.mapping),
        ]
        data_name = ["data", "im_info", "im_id", "rec_id"]
        label_name = []

    import core.detection_metric as metric

    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
    ]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
