"""Micro RetinaNet config for CPU end-to-end tests."""
import os

from models.retinanet.builder import RetinaNet as Detector
from models.retinanet.builder import MSRAResNet50V1FPN as Backbone
from models.retinanet.builder import RetinaNetNeck as Neck
from models.retinanet.builder import RetinaNetHead as RpnHead
from mxnext.complicate import normalizer_factory

DATA_ROOT = os.environ.get("MICRO_DATA_ROOT", "/tmp/simpledet_micro")


def get_config(is_train):
    class General:
        log_frequency = 2
        name = "retina_micro_test"
        batch_image = 2
        fp16 = False
        loader_worker = 2

    class KvstoreParam:
        kvstore = "mesh"
        batch_image = General.batch_image
        gpus = [0]
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
        num_class = 1 + 3
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image
        sync_loss = True

        class anchor_generate:
            scale = (4,)
            ratio = (0.5, 1.0, 2.0)
            stride = (8, 16, 32, 64, 128)
            image_anchor = None

        class anchor_assign:
            allowed_border = 9999
            pos_thr = 0.5
            neg_thr = 0.4
            min_pos_thr = 0.0

        class head:
            conv_channel = 32
            mean = None
            std = None

        class proposal:
            pre_nms_top_n = 50
            min_det_score = 0.02

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    class BboxParam:
        pass

    class RoiParam:
        pass

    class DatasetParam:
        image_set = ("micro_train",) if is_train else ("micro_val",)
        cache_dir = os.path.join(DATA_ROOT, "cache")

    backbone = Backbone(BackboneParam)
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
            prefix = "experiments/retina_micro_test/checkpoint"
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
    metric_list = [metric.ScalarLoss("Focal", ["retina_cls_loss"], [])]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
