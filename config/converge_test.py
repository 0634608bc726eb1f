"""Convergence-proof config (tests/test_convergence.py).

micro_test proves the CLI runs; this config proves the framework LEARNS:
a depth-18 bottleneck FPN Faster R-CNN with SyncBN overfits a 16-image
synthetic set from scratch until train-set AP >= 0.9 — the in-env proxy
for the reference's MODEL_ZOO mAP regression gate
(/root/reference/MODEL_ZOO.md:99). Same 13-tuple schema as real configs.
"""
import os

from symbol.builder import FasterRcnn as Detector
from models.FPN.builder import MSRAResNet50V1FPN
from models.FPN.builder import FPNNeck as Neck
from models.FPN.builder import FPNRpnHead as RpnHead
from models.FPN.builder import FPNRoiAlign as RoiExtractor
from models.FPN.builder import FPNBbox2fcHead as BboxHead
from mxnext.complicate import normalizer_factory

DATA_ROOT = os.environ.get("CONVERGE_DATA_ROOT", "/tmp/simpledet_converge")


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18   # bottleneck-block R18: half the units of R50, 1-core friendly


def get_config(is_train):
    class General:
        log_frequency = 20
        name = "converge_test"
        # global batch 8 on the 8-device test mesh; CONVERGE_BATCH=8 gives
        # the same global batch on one real chip (hyperparameter tuning)
        batch_image = int(os.environ.get("CONVERGE_BATCH", "1"))
        fp16 = False
        loader_worker = 2
        checkpoint_period = 1000  # only the final epoch's checkpoint is kept

    class KvstoreParam:
        kvstore = "mesh"
        batch_image = General.batch_image
        gpus = [0]
        fp16 = General.fp16

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

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class DatasetParam:
        image_set = ("converge_train",) if is_train else ("converge_train",)
        cache_dir = os.path.join(DATA_ROOT, "cache")

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
        rpn_test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head)
        rpn_test_sym = detector.get_rpn_test_symbol(
            backbone, neck, rpn_head)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = rpn_test_sym
        from_scratch = True
        random = False

        class pretrain:
            prefix = "nonexistent"
            epoch = 0
            fixed_param = []

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            lr = float(os.environ.get("CONVERGE_LR", "0.005"))
            momentum = 0.9
            wd = 0.00005
            clip_gradient = 35

        class schedule:
            begin_epoch = 0
            end_epoch = int(os.environ.get("CONVERGE_EPOCHS", "120"))
            lr_iter = [int(v) for v in os.environ.get(
                "CONVERGE_LR_ITER", "320,400").split(",")]
            iter_per_epoch = None   # derived from loader (4/epoch)

        class warmup:
            type = "gradual"
            lr = float(os.environ.get("CONVERGE_LR", "0.005")) * 0.1
            iter = int(os.environ.get("CONVERGE_WARMUP", "60"))

    class TestParam:
        min_det_score = 0.05
        max_det_per_image = 20

        process_roidb = lambda x: x          # noqa: E731
        process_output = lambda x, y: x      # noqa: E731

        class model:
            prefix = "experiments/converge_test/checkpoint"
            epoch = int(os.environ.get("CONVERGE_EPOCHS", "120"))

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
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
