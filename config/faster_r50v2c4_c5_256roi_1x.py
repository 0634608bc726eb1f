"""faster_r50v2c4_c5_256roi_1x (reference config/faster_r50v2c4_c5_256roi_1x.py):
plain single-branch ResNet-50-v2 C4 Faster R-CNN with the C5 bbox head —
the degenerate (num_branch=1, no scale-aware ranges) case of the trident
assembly."""

from models.tridentnet.builder import TridentFasterRcnn as Detector
from models.tridentnet.builder import TridentMXNetResNetV2 as Backbone
from models.tridentnet.builder import TridentRpnHead as RpnHead
from models.tridentnet.builder import BboxC5Head as BboxHead
from symbol.builder import Neck, RoiAlign as RoiExtractor
from mxnext.complicate import normalizer_factory


def get_config(is_train):
    class Trident:
        num_branch = 1
        train_scaleaware = False
        test_scaleaware = False
        valid_ranges = None

    class General:
        log_frequency = 10
        name = __name__.rsplit("/")[-1].rsplit(".")[-1]
        batch_image = 1 if is_train else 1
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
        depth = 50
        trident = Trident

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image * Trident.num_branch

        class anchor_generate:
            scale = (2, 4, 8, 16, 32)
            ratio = (0.5, 1.0, 2.0)
            stride = (16,)
            image_anchor = 256

        class anchor_assign:
            allowed_border = 0
            pos_thr = 0.7
            neg_thr = 0.3
            min_pos_thr = 0.0
            image_anchor = 256
            pos_fraction = 0.5

        class head:
            conv_channel = 512
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_top_n = 12000 if is_train else 6000
            post_nms_top_n = 500 if is_train else 300
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 256
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
        depth = 50
        image_roi = 256
        batch_image = General.batch_image * Trident.num_branch

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 14
        stride = 16

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
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            num_branch=Trident.num_branch,
            scaleaware=Trident.train_scaleaware)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head,
            num_branch=Trident.num_branch,
            scaleaware=Trident.test_scaleaware)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = None
        from_scratch = False
        random = True
        memonger = False

        class pretrain:
            prefix = "pretrain_model/resnet-v2-50"
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
        min_det_score = 0.05
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

    from simpledet_tpu.config_templates import standard_transforms
    transform, data_name, label_name = standard_transforms(is_train)

    import core.detection_metric as metric
    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
    ]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam, \
        ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
