"""RepPoints with moment transform (reference config/RepPoints/)."""
from models.RepPoints.builder import (RepPointsDetector, RepPointsHead,
                                      FCOSFPNNeck, MSRAResNet50V1FPN)
from mxnext.complicate import normalizer_factory
from simpledet_tpu.config_templates import standard_transforms


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
        num_class = 1 + 80
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class point_generate:
            num_points = 9
            scale = 4
            stride = (8, 16, 32, 64, 128)
            transform = "moment"

        class head:
            conv_channel = 256
            point_conv_channel = 256

        class proposal:
            pre_nms_top_n = 1000
            min_det_score = 0.05

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

    class DatasetParam:
        if is_train:
            image_set = ("coco_train2017",)
        else:
            image_set = ("coco_val2017",)

    backbone = MSRAResNet50V1FPN(BackboneParam)
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
        from_scratch = False
        random = True
        memonger = False

        class pretrain:
            prefix = "pretrain_model/resnet-v1-50"
            epoch = 0
            fixed_param = ["conv0", "stage1", "scale", "bias"]

    n_dev_img = len(KvstoreParam.gpus) * KvstoreParam.batch_image

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            lr = 0.01 / 8 * n_dev_img
            momentum = 0.9
            wd = 0.0001
            clip_gradient = None

        class schedule:
            begin_epoch = 0
            end_epoch = 6
            lr_iter = [60000 * 16 // n_dev_img, 80000 * 16 // n_dev_img]
            iter_per_epoch = 90000 * 16 // n_dev_img // 6

        class warmup:
            type = "gradual"
            lr = 0.01 / 8 * n_dev_img / 3.0
            iter = 500

    class TestParam:
        min_det_score = 0
        max_det_per_image = 100
        process_roidb = lambda x: x          # noqa: E731
        process_output = lambda x, y: x      # noqa: E731

        class model:
            prefix = "experiments/{}/checkpoint".format(General.name)
            epoch = 6

        class nms:
            type = "nms"
            thr = 0.5

        class coco:
            annotation = "data/coco/annotations/instances_val2017.json"

    transform, data_name, label_name = standard_transforms(is_train)
    import core.detection_metric as metric
    metric_list = [
        metric.ScalarLoss("ClsL", ["reppoints_cls_loss"], []),
        metric.ScalarLoss("InitL", ["reppoints_init_loss"], []),
        metric.ScalarLoss("RefineL", ["reppoints_refine_loss"], []),
    ]
    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
