"""fcos_r50v1_fpn_1x — FCOS (anchor-free), ResNet-50-v1 FPN P3-P7, 1x, COCO.

Schema-compatible with the reference config/fcos_r50v1_fpn_1x.py. Targets
(location assignment, centerness, offsets) are generated on-device inside
the jitted step instead of the reference's CustomOp CPU kernels.
"""
from symbol.builder import RPN as Detector
from models.FCOS.builder import MSRAResNet50V1FPN as Backbone
from models.FCOS.builder import FCOSFPNNeck as Neck
from models.FCOS.builder import FCOSFPNHead as RpnHead
from mxnext.complicate import normalizer_factory

INF = 1e10


def get_config(is_train):
    class General:
        log_frequency = 20
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

    class BboxParam:
        pass

    class RoiParam:
        pass

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class head:
            conv_channel = 256
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_thresh = 0.05
            pre_nms_top_n = 1000
            post_nms_top_n = 1000
            fpn_box_max_n = 100
            nms_thr = 0.6
            min_bbox_side = 0

        class loss_setting:
            focal_loss_alpha = 0.25
            focal_loss_gamma = 2.0
            ignore_label = -1
            ignore_offset = -1

        class FCOSParam:
            num_classifier = 81 - 1
            stride = (8, 16, 32, 64, 128)

    class DatasetParam:
        if is_train:
            image_set = ("coco_train2017",)
        else:
            image_set = ("coco_val2017",)

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
            thr = 0.6

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
        metric.ScalarLoss("CenternessL", ["fcos_centerness_loss"], []),
        metric.ScalarLoss("ClsL", ["fcos_cls_loss"], []),
        metric.ScalarLoss("OffsetL", ["fcos_offset_loss"], []),
    ]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
