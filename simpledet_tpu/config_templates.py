"""Config factories for the standard experiment grid.

The reference keeps 118 fully-written config files; the schema-relevant
content per family is identical up to (backbone depth/variant, schedule
multiplier, bf16, component classes). These factories produce the exact
13-tuple contract (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
DatasetParam, ModelParam, OptimizeParam, TestParam, transform, data_name,
label_name, metric_list) so config files stay tiny:

    from simpledet_tpu.config_templates import faster_fpn_config
    def get_config(is_train):
        return faster_fpn_config(is_train, __name__, depth=101)

Hyperparameters mirror the reference experiment files of the same names.
"""


def faster_fpn_config(is_train, name, *, depth=50, variant="v1",
                      fp16=False, schedule_mult=1, backbone=None, neck=None,
                      rpn_head=None, bbox_head=None, detector=None,
                      num_class=81, neck_attrs=None):
    from mxnext.complicate import normalizer_factory

    class General:
        log_frequency = 10
        batch_image = 2 if is_train else 1
        loader_worker = 8

    General.name = name.rsplit("/")[-1].rsplit(".")[-1]
    General.fp16 = fp16

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

    BackboneParam.depth = depth

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
            num_reg_class = num_class
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        image_roi = 512
        batch_image = General.batch_image

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    BboxParam.num_class = num_class

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

    # components -------------------------------------------------------------
    if backbone is None:
        from models.FPN import builder as fpn_builder
        bb_name = {
            ("v1", 50): "MSRAResNet50V1FPN", ("v1", 101): "MSRAResNet101V1FPN",
            ("v1b", 50): "ResNet50V1bFPN", ("v1b", 101): "ResNet101V1bFPN",
            ("v1d", 50): "ResNet50V1dFPN",
        }[(variant, depth)]
        backbone = getattr(fpn_builder, bb_name)
    from models.FPN.builder import (FPNBbox2fcHead, FPNNeck, FPNRoiAlign,
                                    FPNRpnHead)
    from symbol.builder import FasterRcnn
    neck = neck or FPNNeck
    rpn_head = rpn_head or FPNRpnHead
    bbox_head = bbox_head or FPNBbox2fcHead
    detector = (detector or FasterRcnn)()

    bb = backbone(BackboneParam)
    for k, v in (neck_attrs or {}).items():
        setattr(NeckParam, k, v)
    nk = neck(NeckParam)
    rh = rpn_head(RpnParam)
    re = FPNRoiAlign(RoiParam)
    bh = bbox_head(BboxParam)
    if is_train:
        train_sym = detector.get_train_symbol(bb, nk, rh, re, bh)
        test_sym = None
        rpn_test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(bb, nk, rh, re, bh)
        rpn_test_sym = detector.get_rpn_test_symbol(bb, nk, rh)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = rpn_test_sym
        from_scratch = False
        random = True
        memonger = False
        memonger_until = "stage3"

        class pretrain:
            epoch = 0
            fixed_param = ["conv0", "stage1", "scale", "bias"]

    ModelParam.pretrain.prefix = f"pretrain_model/resnet-{variant}-{depth}"

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
            end_epoch = 6 * schedule_mult
            lr_iter = [60000 * 16 * schedule_mult // n_dev_img,
                       80000 * 16 * schedule_mult // n_dev_img]
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
            epoch = 6 * schedule_mult

        class nms:
            type = "nms"
            thr = 0.5

        class coco:
            annotation = "data/coco/annotations/instances_val2017.json"

    TestParam.model.prefix = f"experiments/{General.name}/checkpoint"

    transform, data_name, label_name = standard_transforms(is_train)
    import core.detection_metric as metric
    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam,
            transform, data_name, label_name, metric_list)


def standard_transforms(is_train, short=800, long=1333, max_num_gt=100):
    class NormParam:
        mean = (122.7717, 115.9465, 102.9801)
        std = (1.0, 1.0, 1.0)

    class ResizeParam:
        pass

    ResizeParam.short = short
    ResizeParam.long = long

    class PadParam:
        pass

    PadParam.short = short
    PadParam.long = long
    PadParam.max_num_gt = max_num_gt

    class RenameParam:
        mapping = dict(image="data")

    from core.detection_input import (ConvertImageFromHwcToChw,
                                      Flip2DImageBbox, Norm2DImage,
                                      Pad2DImageBbox, ReadRoiRecord,
                                      RenameRecord, Resize2DImageBbox)
    if is_train:
        transform = [
            ReadRoiRecord(None), Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam), Flip2DImageBbox(),
            Pad2DImageBbox(PadParam), ConvertImageFromHwcToChw(),
            RenameRecord(RenameParam.mapping),
        ]
        return transform, ["data"], ["gt_bbox", "im_info"]
    transform = [
        ReadRoiRecord(None), Norm2DImage(NormParam),
        Resize2DImageBbox(ResizeParam), Pad2DImageBbox(PadParam),
        ConvertImageFromHwcToChw(), RenameRecord(RenameParam.mapping),
    ]
    return transform, ["data", "im_info", "im_id", "rec_id"], []


def retina_fpn_config(is_train, name, *, depth=50, fp16=False, neck=None,
                      head=None, neck_args=None, num_class=81,
                      scale_octaves=True):
    """RetinaNet-style single-stage grid (also FreeAnchor/SEPC via
    neck/head overrides)."""
    from mxnext.complicate import normalizer_factory

    class General:
        log_frequency = 10
        batch_image = 2 if is_train else 1
        loader_worker = 8

    General.name = name.rsplit("/")[-1].rsplit(".")[-1]
    General.fp16 = fp16

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

    BackboneParam.depth = depth

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image
        sync_loss = True

        class anchor_generate:
            scale = (4 * 2 ** 0, 4 * 2 ** (1.0 / 3.0), 4 * 2 ** (2.0 / 3.0))
            ratio = (0.5, 1.0, 2.0)
            stride = (8, 16, 32, 64, 128)
            image_anchor = None

        class anchor_assign:
            allowed_border = 9999
            pos_thr = 0.5
            neg_thr = 0.4
            min_pos_thr = 0.0

        class head:
            conv_channel = 256
            mean = None
            std = None

        class proposal:
            pre_nms_top_n = 1000
            post_nms_top_n = None
            nms_thr = None
            min_bbox_side = None
            min_det_score = 0.05

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    RpnParam.num_class = num_class

    class BboxParam:
        pass

    class RoiParam:
        pass

    class DatasetParam:
        if is_train:
            image_set = ("coco_train2017",)
        else:
            image_set = ("coco_val2017",)

    from models.retinanet import builder as retina_builder
    backbone_cls = getattr(retina_builder,
                           {50: "MSRAResNet50V1FPN",
                            101: "MSRAResNet101V1FPN"}[depth])
    neck = neck or retina_builder.RetinaNetNeck
    head = head or retina_builder.RetinaNetHead
    detector = retina_builder.RetinaNet()

    bb = backbone_cls(BackboneParam)
    nk = neck(NeckParam) if neck_args is None else neck(NeckParam, neck_args)
    hd = head(RpnParam)
    if is_train:
        train_sym = detector.get_train_symbol(bb, nk, hd)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(bb, nk, hd)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = None
        from_scratch = False
        random = True
        memonger = False

        class pretrain:
            epoch = 0
            fixed_param = ["conv0", "stage1", "scale", "bias"]

    ModelParam.pretrain.prefix = f"pretrain_model/resnet-v1-{depth}"

    n_dev_img = len(KvstoreParam.gpus) * KvstoreParam.batch_image

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            lr = 0.005 / 8 * n_dev_img
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
            lr = 0.005 / 8 * n_dev_img / 3.0
            iter = 500

    class TestParam:
        min_det_score = 0
        max_det_per_image = 100
        process_roidb = lambda x: x          # noqa: E731
        process_output = lambda x, y: x      # noqa: E731

        class model:
            epoch = 6

        class nms:
            type = "nms"
            thr = 0.5

        class coco:
            annotation = "data/coco/annotations/instances_val2017.json"

    TestParam.model.prefix = f"experiments/{General.name}/checkpoint"

    transform, data_name, label_name = standard_transforms(is_train)
    import core.detection_metric as metric
    metric_list = [metric.ScalarLoss("ClsLoss", ["retina_cls_loss"], [])]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam,
            transform, data_name, label_name, metric_list)
