"""SEPC convergence-proof config (tests/test_converge_sepc.py).

Overfits the shared 16-image synthetic set from scratch until train-set
box AP >= 0.6 through train -> checkpoint -> detection_test — learning
proof for scale-equalizing pyramid convolution (VERDICT r4 Weak #3;
reference models/sepc/, config/sepc/). Gates the cross-level Pconv
stack + shared combine head actually training. Env prefix:
CONVERGE_SEPC_*.
"""
from models.retinanet.builder import RetinaNet as Detector
from models.retinanet.builder import MSRAResNet50V1FPN
from models.sepc.builder import (RetinaNetHeadWithBNWithSEPC,
                                 RetinaNetNeckWithBNWithSEPC)
from models.retinanet.builder import RetinaNetHead as _BaseHead
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_SEPC"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_sepc", PREFIX)
    KvstoreParam = cc.make_kvstore(General)

    class NormalizeParam:
        normalizer = normalizer_factory(type="syncbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class SEPCParam:
        Pconv_num = 2
        pconv_deform = False
        lcconv_deform = False
        ibn = False
        lcconv = True

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        SEPC = SEPCParam

    class RpnParam:
        num_class = 1 + 3
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image
        sync_loss = True

        class anchor_generate:
            # scale 2 on strides 8-128 covers the 15-48px resized objects
            # (30-80px at scale 0.6) with IoU>=0.5 anchors at P3/P4
            scale = (2, 2 ** (1.0 / 2.0) * 2)
            ratio = (0.5, 1.0, 2.0)
            stride = (8, 16, 32, 64, 128)
            image_anchor = None

        class anchor_assign:
            allowed_border = 9999
            pos_thr = 0.5
            neg_thr = 0.4
            min_pos_thr = 0.0

        class head:
            conv_channel = 64
            mean = None
            std = None

        class proposal:
            pre_nms_top_n = 100
            min_det_score = 0.02

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    class BboxParam:
        pass

    class RoiParam:
        pass

    DatasetParam = cc.make_dataset(is_train)
    # adam 5e-4 (the converge-retina finding: focal-loss recipes at this
    # scale stall under short-schedule SGD; see config/converge_retina.py)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.0005", epochs="160",
                                     warmup="60", lr_iter="480,560",
                                     wd=0.00001, opt_type="adam")
    TestParam = cc.make_test_param("converge_sepc", PREFIX, OptimizeParam,
                                   min_det_score=0.05)

    backbone = TinyBackbone(BackboneParam)
    neck = RetinaNetNeckWithBNWithSEPC(NeckParam)
    RpnParam.SEPC = SEPCParam
    rpn_head = RetinaNetHeadWithBNWithSEPC(RpnParam)
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

    transform, data_name, label_name = cc.make_transforms(is_train)

    import core.detection_metric as metric
    metric_list = [metric.ScalarLoss("Focal", ["retina_cls_loss"], []),
                   metric.ScalarLoss("RegL1", ["retina_reg_loss"], [])]

    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
